"""Pallas gap-closing rollout kernel vs the XLA scan rollout."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trajectory_optimization_matrix_lie_groups_tpu.ops.pallas_rollout import (
    pallas_rollout,
)
from trajectory_optimization_matrix_lie_groups_tpu.solvers.batched import FastBatchSolver
from trajectory_optimization_matrix_lie_groups_tpu.tasks.parity import build_benchmark


@pytest.mark.slow
def test_pallas_rollout_matches_scan():
    data, solver, params, x0, us0, _ = build_benchmark("se3_tracking", True)
    H, B = 30, 3
    cp = params["cost"]
    cut = lambda a: a[: H + 1]
    params = {**params, "cost": cp._replace(
        q_ref=cut(cp.q_ref), q_ref_inv=cut(cp.q_ref_inv),
        Ad_ref=cut(cp.Ad_ref), xi_ref=cut(cp.xi_ref))}
    q_ref = params["cost"].q_ref
    xi_ref = params["cost"].xi_ref

    fast = FastBatchSolver(solver.model, N=H, iterations=1, use_pallas=False)
    key = jax.random.PRNGKey(0)
    from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3

    dq = 0.05 * jax.random.normal(key, (B, 6))
    q0s = SE3.normalize(q_ref[0][None] @ SE3.exp(dq))
    xi0s = jnp.broadcast_to(xi_ref[0], (B, 6))
    qs = jnp.concatenate([q0s[:, None],
                          jnp.broadcast_to(q_ref[1:], (B, H, 4, 4))], axis=1)
    xis = jnp.concatenate([xi0s[:, None],
                           jnp.broadcast_to(xi_ref[1:], (B, H, 6))], axis=1)
    us = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, H, 6))
    # f32 contract: the kernel's polynomial atan is f32-grade (~1e-7)
    qs, xis, us = (jnp.asarray(a, jnp.float32) for a in (qs, xis, us))
    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, params)

    lin = fast._linearize(params, qs, xis, us)
    k, K, Vx1, Vxx1 = fast._backward(lin)

    qs_r, xis_r, us_r = fast._rollout(params, lin, qs, xis, us, k, K)

    from trajectory_optimization_matrix_lie_groups_tpu.ops import se3 as se3ops

    exp_d = se3ops.exp(lin["d"][..., :6])
    fq_inv = se3ops.inverse(lin["fq"])
    dp = params["dyn"]
    qs_p, xis_p, us_p = pallas_rollout(
        qs, xis, us, k, K, lin["d"], lin["fxi"], exp_d, fq_inv,
        dp.J, dp.Jinv, float(dp.dt),
        interpret=(jax.default_backend() != "tpu"))

    np.testing.assert_allclose(np.asarray(us_p), np.asarray(us_r), atol=5e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(xis_p), np.asarray(xis_r), atol=5e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(qs_p), np.asarray(qs_r), atol=5e-4, rtol=1e-5)


@pytest.mark.slow
def test_pallas_linearize_matches_broadcast():
    from trajectory_optimization_matrix_lie_groups_tpu.ops.pallas_linearize import (
        pallas_linearize,
    )

    data, solver, params, x0, us0, _ = build_benchmark("se3_tracking", True)
    H, B = 25, 3
    cp = params["cost"]
    cut = lambda a: a[: H + 1]
    params = {**params, "cost": cp._replace(
        q_ref=cut(cp.q_ref), q_ref_inv=cut(cp.q_ref_inv),
        Ad_ref=cut(cp.Ad_ref), xi_ref=cut(cp.xi_ref))}
    q_ref = params["cost"].q_ref
    xi_ref = params["cost"].xi_ref
    fast = FastBatchSolver(solver.model, N=H, iterations=1, use_pallas=False)
    key = jax.random.PRNGKey(3)
    from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3

    dq = 0.05 * jax.random.normal(key, (B, 6))
    q0s = SE3.normalize(q_ref[0][None] @ SE3.exp(dq))
    xi0s = jnp.broadcast_to(xi_ref[0], (B, 6))
    qs = jnp.concatenate([q0s[:, None],
                          jnp.broadcast_to(q_ref[1:], (B, H, 4, 4))], axis=1)
    xis = jnp.concatenate([xi0s[:, None],
                           jnp.broadcast_to(xi_ref[1:], (B, H, 6))], axis=1)
    us = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (B, H, 6))
    qs, xis, us = (jnp.asarray(a, jnp.float32) for a in (qs, xis, us))
    params32 = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, params)

    lin_r = fast._linearize(params32, qs, xis, us)
    cp32 = params32["cost"]
    dp32 = params32["dyn"]
    out = pallas_linearize(qs, xis, us, cp32.q_ref_inv, cp32.Ad_ref,
                           cp32.xi_ref, dp32.J, dp32.Jinv, cp32.Q1, cp32.Q2,
                           float(dp32.dt),
                           interpret=(jax.default_backend() != "tpu"))
    for name in ("fq", "fxi", "d", "Fx"):
        np.testing.assert_allclose(np.asarray(out[name]),
                                   np.asarray(lin_r[name]),
                                   atol=5e-4, rtol=1e-4, err_msg=name)
    np.testing.assert_allclose(np.asarray(out["lx"]),
                               np.asarray(lin_r["Lx"][:, :-1]),
                               atol=5e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["lxx"]),
                               np.asarray(lin_r["Lxx"][:, :-1]),
                               atol=5e-3, rtol=1e-4)
