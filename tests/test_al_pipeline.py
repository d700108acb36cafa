"""Constrained pipeline solves: ALPipelineSolver == ALFastSolver (interpret
mode on CPU; on TPU the same code runs the real kernels)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trajectory_optimization_matrix_lie_groups_tpu.models import (
    constraints as cs,
    costs,
    dynamics,
)
from trajectory_optimization_matrix_lie_groups_tpu.models.base import make_model
from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3
from trajectory_optimization_matrix_lie_groups_tpu.solvers.al_fast import ALFastSolver
from trajectory_optimization_matrix_lie_groups_tpu.solvers.al_pipeline import (
    ALPipelineSolver,
)
from trajectory_optimization_matrix_lie_groups_tpu.solvers.batched import (
    FastBatchSolver,
)
from trajectory_optimization_matrix_lie_groups_tpu.solvers.pipeline import (
    PallasPipelineSolver,
)
from trajectory_optimization_matrix_lie_groups_tpu.utils import load_benchmark_pickle

PKL = ("/root/reference/visualization/results_benchmark_2nd_draft/"
       "results_se3_tracking_benchmark.pkl")


@pytest.mark.parity
def test_al_pipeline_matches_al_fast():
    data = load_benchmark_pickle(PKL)
    prob = data["prob"]
    H, B, ITERS = 24, 2, 12
    q_ref = jnp.asarray(np.asarray(prob["q_ref"])[: H + 1], jnp.float32)
    xi_ref = jnp.asarray(
        np.asarray(prob["xi_ref"])[: H + 1].reshape(H + 1, 6), jnp.float32)

    dyn = dynamics.se3_dynamics()
    dp = dynamics.se3_params(jnp.asarray(prob["J"], jnp.float32),
                             jnp.asarray(float(prob["dt"]), jnp.float32))
    cd = costs.tracking_cost(SE3, 6)
    cp = costs.tracking_cost_params(
        SE3, jnp.asarray(prob["Q"], jnp.float32),
        jnp.asarray(prob["R"], jnp.float32),
        jnp.asarray(prob["P"], jnp.float32), q_ref, xi_ref)

    dq = 0.03 * jax.random.normal(jax.random.PRNGKey(2), (B, 6), jnp.float32)
    q0s = SE3.normalize(q_ref[0][None] @ SE3.exp(dq))
    xi0s = jnp.broadcast_to(xi_ref[0], (B, 6)) + jnp.float32(0.05)
    us0 = jnp.zeros((B, H, 6), jnp.float32)
    lb, ub = -100.0, 100.0

    # oracle: ALFastSolver around the XLA-path FastBatchSolver (same cost
    # wrapper via models.costs.al_cost)
    constr = cs.input_box(12, 6)
    al_cd = costs.al_cost(cd, constr)
    model_c, _ = make_model(dyn, al_cd, dp, None)
    constr_p = jax.tree.map(lambda x: x.astype(jnp.float32),
                            cs.input_box_params(lb, ub, 6))
    alp = costs.al_init_params(cp, constr_p, H, constr.constr_size,
                               mu0=1e-2, dtype=jnp.float32)
    inner = FastBatchSolver(model_c, N=H, iterations=ITERS, use_pallas=False)
    ref = ALFastSolver(inner, constr, tol_constr=1e-2).solve(
        {"dyn": dp, "cost": alp}, q0s, xi0s, us0,
        q_ref=q_ref, xi_ref=xi_ref, n_al_iters=10)

    pipe = PallasPipelineSolver(N=H, iterations=ITERS, dt=float(prob["dt"]),
                                interpret=jax.default_backend() != "tpu")
    alp_pipe = ALPipelineSolver(pipe, lb=np.full(6, lb), ub=np.full(6, ub),
                                tol_constr=1e-2)
    res = alp_pipe.solve(dp, cp, q0s, xi0s, us0, n_al_iters=10)

    assert res.outer_iterations == ref.outer_iterations
    assert res.constr_converged == bool(ref.constr_converged)
    np.testing.assert_allclose(np.asarray(res.us), np.asarray(ref.us),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(res.max_violation),
                               np.asarray(ref.max_violation), atol=2e-4)
    assert float(res.us.max()) <= ub + 1e-1
    assert float(res.us.min()) >= lb - 1e-1
