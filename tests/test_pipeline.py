"""Lane-layout pipeline solver vs FastBatchSolver (same iterates)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trajectory_optimization_matrix_lie_groups_tpu.solvers.batched import FastBatchSolver
from trajectory_optimization_matrix_lie_groups_tpu.solvers.pipeline import (
    PallasPipelineSolver,
)
from trajectory_optimization_matrix_lie_groups_tpu.tasks.parity import build_benchmark


def test_pipeline_matches_fast_batch():
    data, solver, params, x0, us0, _ = build_benchmark("se3_tracking", True)
    H, B, ITERS = 30, 3, 4
    cp = params["cost"]
    cut = lambda a: a[: H + 1]
    cp = cp._replace(q_ref=cut(cp.q_ref), q_ref_inv=cut(cp.q_ref_inv),
                     Ad_ref=cut(cp.Ad_ref), xi_ref=cut(cp.xi_ref))
    params = {**params, "cost": cp}
    to32 = lambda t: jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, t)
    params = to32(params)
    cp = params["cost"]
    dp = params["dyn"]

    key = jax.random.PRNGKey(0)
    from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3

    dq = 0.05 * jax.random.normal(key, (B, 6), dtype=jnp.float32)
    q0s = SE3.normalize(cp.q_ref[0][None] @ SE3.exp(dq))
    xi0s = jnp.broadcast_to(cp.xi_ref[0], (B, 6))
    us0s = jnp.zeros((B, H, 6), jnp.float32)

    interp = jax.default_backend() != "tpu"
    fast = FastBatchSolver(solver.model, N=H, iterations=ITERS,
                           use_pallas=False, interpret=interp)
    ref = fast.solve(params, q0s, xi0s, us0s, cp.q_ref, cp.xi_ref)

    pipe = PallasPipelineSolver(N=H, iterations=ITERS,
                                dt=float(dp.dt), interpret=interp)
    out = pipe.solve(dp, cp, q0s, xi0s, us0s)

    np.testing.assert_allclose(np.asarray(out.us), np.asarray(ref.us),
                               atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.J_opt), np.asarray(ref.J_opt),
                               rtol=1e-4)


@pytest.mark.slow
def test_pipeline_batch_tile():
    """(batch_tile, stage) grid reproduces the full-batch pipeline exactly."""
    data, solver, params, x0, us0, _ = build_benchmark("se3_tracking", True)
    H, B, ITERS = 20, 4, 3
    cp = params["cost"]
    cut = lambda a: a[: H + 1]
    cp = cp._replace(q_ref=cut(cp.q_ref), q_ref_inv=cut(cp.q_ref_inv),
                     Ad_ref=cut(cp.Ad_ref), xi_ref=cut(cp.xi_ref))
    params = {**params, "cost": cp}
    to32 = lambda t: jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, t)
    params = to32(params)
    cp = params["cost"]
    dp = params["dyn"]

    key = jax.random.PRNGKey(7)
    from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3

    dq = 0.05 * jax.random.normal(key, (B, 6), dtype=jnp.float32)
    q0s = SE3.normalize(cp.q_ref[0][None] @ SE3.exp(dq))
    xi0s = jnp.broadcast_to(cp.xi_ref[0], (B, 6))
    us0s = jnp.zeros((B, H, 6), jnp.float32)

    interp = jax.default_backend() != "tpu"
    full = PallasPipelineSolver(N=H, iterations=ITERS, dt=float(dp.dt),
                                interpret=interp)
    tiled = PallasPipelineSolver(N=H, iterations=ITERS, dt=float(dp.dt),
                                 interpret=interp, batch_tile=2)
    a = full.solve(dp, cp, q0s, xi0s, us0s)
    b = tiled.solve(dp, cp, q0s, xi0s, us0s)
    np.testing.assert_allclose(np.asarray(a.us), np.asarray(b.us), atol=1e-12)
    np.testing.assert_allclose(np.asarray(a.J_opt), np.asarray(b.J_opt),
                               atol=1e-12)


@pytest.mark.slow
def test_pipeline_drone_gravity():
    """Drone family (nu=4, gravity, Pu projection) through all 3 kernels."""
    data, solver, params, x0, us0, _ = build_benchmark("drone_racing", True)
    H, B, ITERS = 25, 3, 4
    cp = params["cost"]
    cut = lambda a: a[: H + 1]
    cp = cp._replace(q_ref=cut(cp.q_ref), q_ref_inv=cut(cp.q_ref_inv),
                     Ad_ref=cut(cp.Ad_ref), xi_ref=cut(cp.xi_ref))
    params = {**params, "cost": cp}
    to32 = lambda t: jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, t)
    params = to32(params)
    cp = params["cost"]
    dp = params["dyn"]

    key = jax.random.PRNGKey(3)
    from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3

    dq = 0.03 * jax.random.normal(key, (B, 6), dtype=jnp.float32)
    q0s = SE3.normalize(cp.q_ref[0][None] @ SE3.exp(dq))
    xi0s = jnp.broadcast_to(cp.xi_ref[0], (B, 6))
    us0s = jnp.zeros((B, H, 4), jnp.float32)

    interp = jax.default_backend() != "tpu"
    fast = FastBatchSolver(solver.model, N=H, iterations=ITERS,
                           use_pallas=False)
    ref = fast.solve(params, q0s, xi0s, us0s, cp.q_ref, cp.xi_ref)

    pipe = PallasPipelineSolver(N=H, iterations=ITERS, dt=float(dp.dt),
                                interpret=interp, gravity=True)
    out = pipe.solve(dp, cp, q0s, xi0s, us0s)

    np.testing.assert_allclose(np.asarray(out.us), np.asarray(ref.us),
                               atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.J_opt), np.asarray(ref.J_opt),
                               rtol=1e-4)


@pytest.mark.slow
def test_pipeline_stage_chunk():
    """chunk>1 grid (multi-stage blocks) reproduces chunk=1 exactly."""
    data, solver, params, x0, us0, _ = build_benchmark("se3_tracking", True)
    H, B, ITERS = 20, 2, 3
    cp = params["cost"]
    cut = lambda a: a[: H + 1]
    cp = cp._replace(q_ref=cut(cp.q_ref), q_ref_inv=cut(cp.q_ref_inv),
                     Ad_ref=cut(cp.Ad_ref), xi_ref=cut(cp.xi_ref))
    params = {**params, "cost": cp}
    cp, dp = params["cost"], params["dyn"]

    from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3

    # f64 so op-fusion rounding differences between the two unrollings do
    # not mask exact algorithmic equivalence
    dq = 0.05 * jax.random.normal(jax.random.PRNGKey(11), (B, 6))
    q0s = SE3.normalize(cp.q_ref[0][None] @ SE3.exp(dq))
    xi0s = jnp.broadcast_to(cp.xi_ref[0], (B, 6))
    us0s = jnp.zeros((B, H, 6))

    interp = jax.default_backend() != "tpu"
    base = PallasPipelineSolver(N=H, iterations=ITERS, dt=float(dp.dt),
                                interpret=interp)
    chunked = PallasPipelineSolver(N=H, iterations=ITERS, dt=float(dp.dt),
                                   interpret=interp, stage_chunk=4)
    a = base.solve(dp, cp, q0s, xi0s, us0s)
    b = chunked.solve(dp, cp, q0s, xi0s, us0s)
    np.testing.assert_allclose(np.asarray(a.us), np.asarray(b.us), atol=1e-8)
    np.testing.assert_allclose(np.asarray(a.J_opt), np.asarray(b.J_opt),
                               rtol=1e-10)


@pytest.mark.slow
def test_pipeline_fused_matches_unfused():
    """2-kernel fused (rollout+linearize) layout == 3-kernel layout exactly."""
    data, solver, params, x0, us0, _ = build_benchmark("se3_tracking", True)
    H, B, ITERS = 20, 2, 4
    cp = params["cost"]
    cut = lambda a: a[: H + 1]
    cp = cp._replace(q_ref=cut(cp.q_ref), q_ref_inv=cut(cp.q_ref_inv),
                     Ad_ref=cut(cp.Ad_ref), xi_ref=cut(cp.xi_ref))
    dp = params["dyn"]

    from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3

    # f64: the two layouts must be algorithmically identical
    dq = 0.05 * jax.random.normal(jax.random.PRNGKey(13), (B, 6))
    q0s = SE3.normalize(cp.q_ref[0][None] @ SE3.exp(dq))
    xi0s = jnp.broadcast_to(cp.xi_ref[0], (B, 6))
    us0s = jnp.zeros((B, H, 6))

    interp = jax.default_backend() != "tpu"
    a = PallasPipelineSolver(N=H, iterations=ITERS, dt=float(dp.dt),
                             interpret=interp, fused=False
                             ).solve(dp, cp, q0s, xi0s, us0s)
    b = PallasPipelineSolver(N=H, iterations=ITERS, dt=float(dp.dt),
                             interpret=interp, fused=True
                             ).solve(dp, cp, q0s, xi0s, us0s)
    np.testing.assert_allclose(np.asarray(b.us), np.asarray(a.us), atol=1e-12)
    np.testing.assert_allclose(np.asarray(b.J_opt), np.asarray(a.J_opt),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(b.grad_norm),
                               np.asarray(a.grad_norm), rtol=1e-10)


@pytest.mark.slow
def test_pipeline_fused_drone_gravity():
    """Fused layout on the drone family (gravity + nu=4)."""
    data, solver, params, x0, us0, _ = build_benchmark("drone_racing", True)
    H, B, ITERS = 16, 2, 3
    cp = params["cost"]
    cut = lambda a: a[: H + 1]
    cp = cp._replace(q_ref=cut(cp.q_ref), q_ref_inv=cut(cp.q_ref_inv),
                     Ad_ref=cut(cp.Ad_ref), xi_ref=cut(cp.xi_ref))
    dp = params["dyn"]

    from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3

    dq = 0.03 * jax.random.normal(jax.random.PRNGKey(5), (B, 6))
    q0s = SE3.normalize(cp.q_ref[0][None] @ SE3.exp(dq))
    xi0s = jnp.broadcast_to(cp.xi_ref[0], (B, 6))
    us0s = jnp.zeros((B, H, 4))

    interp = jax.default_backend() != "tpu"
    a = PallasPipelineSolver(N=H, iterations=ITERS, dt=float(dp.dt),
                             interpret=interp, gravity=True, fused=False
                             ).solve(dp, cp, q0s, xi0s, us0s)
    b = PallasPipelineSolver(N=H, iterations=ITERS, dt=float(dp.dt),
                             interpret=interp, gravity=True, fused=True
                             ).solve(dp, cp, q0s, xi0s, us0s)
    np.testing.assert_allclose(np.asarray(b.us), np.asarray(a.us), atol=1e-12)
    np.testing.assert_allclose(np.asarray(b.J_opt), np.asarray(a.J_opt),
                               rtol=1e-12)

@pytest.mark.slow
def test_pipeline_sublane_layout_matches_lane():
    """sublanes=8 (batch packed over both vreg axes, the round-5 VPU-
    utilization layout) reproduces the lane layout's iterates bit-for-bit
    on us/qs/xis; J/grad agree to f32 reduction-order noise.  Covers
    unconstrained and AL paths, fused and unfused, tiled and untiled."""
    from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3

    data, solver, params, x0, us0, _ = build_benchmark("se3_tracking", True)
    H, B, ITERS = 12, 16, 4
    cp = params["cost"]
    cut = lambda a: a[: H + 1]
    cp = cp._replace(q_ref=cut(cp.q_ref), q_ref_inv=cut(cp.q_ref_inv),
                     Ad_ref=cut(cp.Ad_ref), xi_ref=cut(cp.xi_ref))
    params = {**params, "cost": cp}
    to32 = lambda t: jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, t)
    params = to32(params)
    cp = params["cost"]
    dp = params["dyn"]

    dq = 0.05 * jax.random.normal(jax.random.PRNGKey(3), (B, 6), jnp.float32)
    q0s = SE3.normalize(cp.q_ref[0][None] @ SE3.exp(dq))
    xi0s = jnp.broadcast_to(cp.xi_ref[0], (B, 6))
    us0s = jnp.zeros((B, H, 6), jnp.float32)
    lmbd = jnp.asarray(np.abs(np.random.default_rng(0).normal(
        size=(B, H + 1, 12))), jnp.float32)
    imu = jnp.full((B, H + 1, 12), jnp.float32(0.5))
    al = (np.full(6, -5.0), np.full(6, 5.0), lmbd, imu)

    interp = jax.default_backend() != "tpu"
    for al_arg in (None, al):
        for bt, fused in ((None, True), (8, True), (None, False)):
            p1 = PallasPipelineSolver(N=H, iterations=ITERS, dt=float(dp.dt),
                                      interpret=interp, batch_tile=bt,
                                      fused=fused)
            p8 = PallasPipelineSolver(N=H, iterations=ITERS, dt=float(dp.dt),
                                      interpret=interp, batch_tile=bt,
                                      fused=fused, sublanes=8)
            a = p1.solve(dp, cp, q0s, xi0s, us0s, al=al_arg)
            b = p8.solve(dp, cp, q0s, xi0s, us0s, al=al_arg)
            for f in ("us", "qs", "xis"):
                np.testing.assert_allclose(
                    np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
                    atol=1e-6, err_msg=f"{f} al={al_arg is not None} "
                    f"bt={bt} fused={fused}")
            for f in ("J_opt", "grad_norm"):
                np.testing.assert_allclose(
                    np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
                    rtol=1e-4, atol=1e-5)


def test_sublane_pack_unpack_roundtrip_and_tile_mapping():
    """_pack/_unpack are mutually inverse, and a packed lane tile's
    (S, bt/S) block holds exactly the same bt problems as the lane
    layout's contiguous tile (the property the BlockSpec index maps
    rely on)."""
    B, bt, S = 64, 16, 8
    p = PallasPipelineSolver(N=4, iterations=1, dt=0.01, interpret=True,
                             batch_tile=bt, sublanes=S)
    x = jnp.arange(5 * 3 * B, dtype=jnp.float32).reshape(5, 3, B)
    y = p._pack(x)
    assert y.shape == (5, 3, S, B // S)
    np.testing.assert_array_equal(np.asarray(p._unpack(y)), np.asarray(x))
    # tile k of the packed lanes covers global elements [k*bt, (k+1)*bt)
    btL = bt // S
    yn = np.asarray(y)
    for k in range(B // bt):
        blk = yn[..., :, k * btL:(k + 1) * btL]           # (5, 3, S, btL)
        want = np.asarray(x)[..., k * bt:(k + 1) * bt].reshape(5, 3, S, btL)
        np.testing.assert_array_equal(blk, want)
