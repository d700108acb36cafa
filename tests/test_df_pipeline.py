"""Double-f32 Pallas pipeline (solvers/df_pipeline.py): DF Lie-op accuracy
and convergence of the DF polish phase to the float64 fixed point.

The headline claim under test: the f32 pipeline alone lands ~1e-3 from the
f64 optimum (flat-direction noise amplification, CLAUDE.md), while the
f32+DF hybrid must land well inside the 1e-4 BASELINE control-fidelity
gate.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trajectory_optimization_matrix_lie_groups_tpu.ops import dfx
from trajectory_optimization_matrix_lie_groups_tpu.ops import pallas_lie as pll
from trajectory_optimization_matrix_lie_groups_tpu.ops import se3
from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3
from trajectory_optimization_matrix_lie_groups_tpu.solvers.batched import (
    FastBatchSolver,
)
from trajectory_optimization_matrix_lie_groups_tpu.solvers.df_pipeline import (
    DFPipelineSolver,
    join_us,
)
from trajectory_optimization_matrix_lie_groups_tpu.tasks.parity import (
    build_benchmark,
)

RNG = np.random.default_rng(3)


def _df_lane(x64):
    """f64 (..., B)-lane host array -> DF of f32 lane arrays."""
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    return dfx.DF(jnp.asarray(hi), jnp.asarray(lo))


def _join(d):
    return np.asarray(d.hi, np.float64) + np.asarray(d.lo, np.float64)


def test_df_lie_ops_match_f64():
    """DF twins of the lane-layout Lie ops vs the f64 host closed forms,
    including near th = pi and near th = 0 (series territory)."""
    B = 64
    w = RNG.uniform(-1.5, 1.5, (B, 3))
    # push some lanes near pi and some tiny
    w[:8] *= np.pi / np.maximum(np.linalg.norm(w[:8], axis=-1, keepdims=True),
                                1e-12) * 0.999
    w[8:16] *= 1e-6
    v = RNG.uniform(-2, 2, (B, 3))
    xi = np.concatenate([w, v], axis=-1)  # (B, 6) [omega, v]

    xi_l = _df_lane(xi.T)                 # (6, B) lanes
    R_df, p_df = pll.se3_exp(xi_l)
    q64 = np.asarray(se3.exp(jnp.asarray(xi, jnp.float64)))  # (B, 4, 4)
    np.testing.assert_allclose(_join(R_df), np.moveaxis(q64[:, :3, :3], 0, -1),
                               atol=2e-13)
    np.testing.assert_allclose(_join(p_df), q64[:, :3, 3].T, atol=2e-13)

    # log(exp(xi)) == xi through the DF quaternion + Newton-atan path
    xi_back = pll.se3_log(R_df, p_df)
    np.testing.assert_allclose(_join(xi_back), xi.T, atol=5e-13)

    # right Jacobian + inverse against the f64 host closed forms
    Jr_df = pll.se3_right_jacobian(xi_l)
    Jr64 = np.asarray(se3.right_jacobian(jnp.asarray(xi, jnp.float64)))
    np.testing.assert_allclose(_join(Jr_df), np.moveaxis(Jr64, 0, -1),
                               atol=2e-13)
    Jri_df = pll.se3_right_jacobian_inv(xi_l)
    Jri64 = np.asarray(se3.right_jacobian_inv(jnp.asarray(xi, jnp.float64)))
    np.testing.assert_allclose(_join(Jri_df), np.moveaxis(Jri64, 0, -1),
                               atol=5e-13)


def test_f32_path_unchanged():
    """The dfx dispatch refactor must leave plain-f32 lane ops bit-exact
    against direct jnp evaluation of the same formulas (spot: exp/log
    round trip still hits f32 accuracy)."""
    B = 32
    xi = RNG.uniform(-1, 1, (B, 6)).astype(np.float32)
    xi_l = jnp.asarray(xi.T)
    R, p = pll.se3_exp(xi_l)
    back = pll.se3_log(R, p)
    np.testing.assert_allclose(np.asarray(back), xi.T, atol=5e-6)
    assert back.dtype == jnp.float32


@pytest.mark.parity
@pytest.mark.parametrize("df_iters", [3])
def test_df_pipeline_hits_f64_fixed_point(df_iters):
    """f32 phase + DF polish lands well inside the 1e-4 gate vs the f64
    solver at the same total budget (the pure-f32 pipeline is ~1e-4..1e-3
    away on the same problem).  parity-marked: the ~100k-primitive DF
    graphs take minutes of XLA:CPU compile on first run."""
    data, solver, params, x0, us0, _ = build_benchmark("se3_tracking", True)
    H, B = 30, 3
    cp = params["cost"]
    cut = lambda a: a[: H + 1]
    cp = cp._replace(q_ref=cut(cp.q_ref), q_ref_inv=cut(cp.q_ref_inv),
                     Ad_ref=cut(cp.Ad_ref), xi_ref=cut(cp.xi_ref))
    params = {**params, "cost": cp}

    key = jax.random.PRNGKey(0)
    dq = 0.05 * jax.random.normal(key, (B, 6), dtype=jnp.float64)
    q0s = SE3.normalize(cp.q_ref[0][None] @ SE3.exp(dq))
    xi0s = jnp.broadcast_to(cp.xi_ref[0], (B, 6))
    us0s = jnp.zeros((B, H, 6), jnp.float64)

    F32_ITERS, TOTAL = 10, 10 + df_iters
    # f64 oracle at the same total iteration budget (same algorithm: fixed
    # budget, mu=0, no line search)
    fast = FastBatchSolver(solver.model, N=H, iterations=TOTAL,
                           use_pallas=False)
    ref = fast.solve(params, q0s, xi0s, us0s, cp.q_ref, cp.xi_ref)
    us_ref = np.asarray(ref.us, np.float64)

    interp = jax.default_backend() != "tpu"
    np_params = jax.tree.map(np.asarray, params)
    dfp = DFPipelineSolver(N=H, dt=float(params["dyn"].dt),
                           f32_iterations=F32_ITERS, df_iterations=df_iters,
                           interpret=interp)
    out = dfp.solve(np_params, q0s, xi0s, us0s)
    us_df = join_us(out)

    err_df = np.max(np.abs(us_df - us_ref))
    assert err_df < 1e-4, err_df

    # the f32 hi parts carry the same accuracy (lo parts are sub-f32-ulp
    # refinement)
    err_hi = np.max(np.abs(np.asarray(out.us_hi, np.float64) - us_ref))
    assert err_hi < 2e-4, err_hi

    # J agrees with the oracle (computed from f32 summations: ~1e-5 grade)
    np.testing.assert_allclose(np.asarray(out.J_opt, np.float64),
                               np.asarray(ref.J_opt, np.float64), rtol=1e-4)

    # and the DF polish genuinely improves on the pure-f32 pipeline at the
    # same total iteration budget
    from trajectory_optimization_matrix_lie_groups_tpu.solvers.pipeline import (
        PallasPipelineSolver,
    )

    to32 = lambda t: jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, t)
    p32 = to32(params)
    pipe32 = PallasPipelineSolver(N=H, iterations=F32_ITERS + df_iters,
                                  dt=float(params["dyn"].dt),
                                  interpret=interp)
    out_f = pipe32.solve(p32["dyn"], p32["cost"],
                         jnp.asarray(q0s, jnp.float32),
                         jnp.asarray(xi0s, jnp.float32),
                         jnp.asarray(us0s, jnp.float32))
    err_f32 = np.max(np.abs(np.asarray(out_f.us, np.float64) - us_ref))
    assert err_df < err_f32 / 3, (err_df, err_f32)
