"""Embedded-Euclidean baseline (TPU-native) vs the Lie-group solver.

Mirrors the benchmark scripts' cross-method comparison
(`benchmark_SE3_tracking.py`): the embedded method should track, but with
nonzero quaternion-norm drift (no manifold enforcement), while the Lie
solver stays on-manifold by construction.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from trajectory_optimization_matrix_lie_groups_tpu.baselines.embedded import solve_su2
from trajectory_optimization_matrix_lie_groups_tpu.utils.metrics import (
    orthogonality_violation,
    quat_norm_violation,
)
from trajectory_optimization_matrix_lie_groups_tpu.tasks.parity import build_benchmark


@pytest.mark.parity
def test_embedded_su2_baseline_tracks():
    data, solver, params, x0, us0, _ = build_benchmark("se3_tracking", True)
    prob = data["prob"]
    H = 80
    q_ref = np.asarray(prob["q_ref"])[: H + 1]
    xi_ref = np.asarray(prob["xi_ref"])[: H + 1]
    cp = params["cost"]
    q0 = jnp.asarray(q_ref[0])
    xi0 = jnp.asarray(xi_ref[0]) + 0.05

    xs, us, J_hist, grad_hist, st = solve_su2(
        prob["J"], float(prob["dt"]), q_ref, xi_ref,
        prob["Q"], prob["R"], prob["P"], (q0, xi0),
        jnp.zeros((H, 6)), n_iterations=60,
    )
    assert np.isfinite(J_hist[-1])
    assert J_hist[-1] < J_hist[0]
    # embedded drift exists but stays small over a short horizon
    drift = np.asarray(quat_norm_violation(xs))
    assert drift.max() < 5e-2  # drift is nonzero by construction
    # position tracking at the end within a tolerance
    p_err = np.asarray(xs[-1, 4:7]) - q_ref[-1][:3, 3]
    assert np.linalg.norm(p_err) < 0.5


def test_lie_solver_stays_on_manifold():
    data, solver, params, x0, us0, _ = build_benchmark("so3_tracking", True)
    import dataclasses

    from trajectory_optimization_matrix_lie_groups_tpu.solvers.lie_ilqr import LieILQR

    cfg = dataclasses.replace(solver.cfg, max_iterations=5, tol_grad_norm=0.0,
                              tol_d_norm=0.0)
    solver = LieILQR(solver.model, cfg)
    (qs, xis), us, *_ = solver.fit(params, x0, us0)
    viol = np.asarray(orthogonality_violation(qs))
    assert viol.max() < 1e-12


@pytest.mark.parity
@pytest.mark.parametrize("variant", ["dynconstr", "logcost", "stabilized"])
def test_embedded_matrix_baselines(variant):
    from trajectory_optimization_matrix_lie_groups_tpu.baselines.embedded import (
        solve_se3_matrix,
    )

    data, solver, params, x0, us0, _ = build_benchmark("se3_tracking", True)
    prob = data["prob"]
    H = 60
    q_ref = np.asarray(prob["q_ref"])[: H + 1]
    xi_ref = np.asarray(prob["xi_ref"])[: H + 1]
    q0 = jnp.asarray(q_ref[0])
    xi0 = jnp.asarray(xi_ref[0]) + 0.05
    xs, us, J_hist, grad_hist, st = solve_se3_matrix(
        prob["J"], float(prob["dt"]), q_ref, xi_ref, prob["Q"], prob["R"],
        prob["P"], (q0, xi0), jnp.zeros((H, 6)), variant=variant,
        n_iterations=40)
    assert J_hist[-1] < J_hist[0]
    Rf = np.asarray(xs[-1][:9]).reshape(3, 3)
    assert np.abs(Rf.T @ Rf - np.eye(3)).max() < 1e-8


@pytest.mark.parametrize("form,pendulum", [
    ("su2", False),
    ("logcost", False),
    ("stabilized", False),
    ("dynconstr", True),
    ("stabilized_logcost", True),
])
def test_so3_family_baselines(form, pendulum):
    """Round-2 completion of the baseline matrix (VERDICT item 5): SU(2)/R^7
    and rotation-matrix/R^12 attitude baselines for SO(3) free attitude AND
    the 3-D pendulum, across all four mechanism families."""
    from trajectory_optimization_matrix_lie_groups_tpu.baselines.embedded import (
        solve_so3_family,
    )

    name = "pendulum_swingup" if pendulum else "so3_tracking"
    data, solver, params, x0, us0, _ = build_benchmark(name, True)
    prob = data["prob"]
    H = 30
    R_ref = np.asarray(prob["q_ref"])[: H + 1]
    xi_ref = np.asarray(prob["xi_ref"])[: H + 1]
    R0 = R_ref[0]
    w0 = np.asarray(xi_ref[0]).reshape(3) + 0.05
    kw = {}
    if pendulum:
        kw = dict(m=float(prob["m"]), length=float(prob["length"]))
    xs, us, J_hist, grad_hist, st = solve_so3_family(
        prob["J"], float(prob["dt"]), R_ref, xi_ref, prob["Q"], prob["R"],
        prob["P"], (R0, w0), np.zeros((H, 3)), formulation=form,
        pendulum=pendulum, n_iterations=25, **kw)
    assert np.isfinite(J_hist[-1])
    assert J_hist[-1] < J_hist[0]
    xs = np.asarray(xs)
    if form == "su2":
        # quaternion drift exists (no manifold enforcement) but is bounded
        drift = np.abs(np.linalg.norm(xs[:, :4], axis=-1) - 1.0)
        assert drift.max() < 0.2
    else:
        Rms = xs[:, :9].reshape(-1, 3, 3)
        viol = np.linalg.norm(
            Rms @ np.swapaxes(Rms, -1, -2) - np.eye(3), axis=(-2, -1))
        assert viol.max() < 0.2
