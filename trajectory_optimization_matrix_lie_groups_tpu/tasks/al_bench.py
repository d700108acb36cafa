"""The reference's N=1400 AL-constrained SE(3) tracking problem.

Rebuilds `main_SE3ddp_tracking_exact_al_ms.py:49-160` exactly: a constant-
twist screw reference (w = (0,0,1), v = (2,0,0.2), dt = 0.01) over a 1400-
stage horizon, GN tracking cost with Q = diag(10,10,10,1,1,1, 1...1),
P = 10 Q, R = 0, input box u in [-10, 10]^6, initial state offset
p0 = (-1,-1,-0.2) with xi0 = (0,0,0.1, 2,0,0.2).

Used by scripts/gen_al1400_golden.py (f64 CPU golden) and
scripts/probe_al1400_tpu.py (the on-chip record, round-3 VERDICT item 2).
"""

import numpy as np

import jax.numpy as jnp

from trajectory_optimization_matrix_lie_groups_tpu.models import costs, dynamics
from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3

__all__ = ["build_al1400"]


def build_al1400(dtype=jnp.float64, horizon=1400):
    """Returns (params {dyn, cost}, lb, ub, q0, xi0, q_ref, xi_ref)."""
    dt = 0.01
    m = 1.0
    Ib = np.diag([0.5, 0.7, 0.9])
    J = np.block([[Ib, np.zeros((3, 3))],
                  [np.zeros((3, 3)), m * np.eye(3)]])

    xi0_ref = np.concatenate([np.array([0.0, 0.0, 1.0]),
                              np.array([1.0, 0.0, 0.1]) * 2.0])
    # constant-twist screw reference: X_{k+1} = X_k expm(hat(xi) dt)
    step = np.asarray(SE3.exp(jnp.asarray(xi0_ref * dt, jnp.float64)),
                      np.float64)
    q_ref = np.zeros((horizon + 1, 4, 4))
    q_ref[0] = np.eye(4)
    for i in range(horizon):
        q_ref[i + 1] = q_ref[i] @ step
    xi_ref = np.broadcast_to(xi0_ref, (horizon + 1, 6)).copy()

    Q = np.diag([10.0, 10.0, 10.0, 1.0, 1.0, 1.0,
                 1.0, 1.0, 1.0, 1.0, 1.0, 1.0])
    P = Q * 10.0
    R = np.zeros((6, 6))

    dyn = dynamics.se3_dynamics()
    dp = dynamics.se3_params(jnp.asarray(J, dtype), jnp.asarray(dt, dtype))
    cd = costs.tracking_cost(SE3, 6)
    cp = costs.tracking_cost_params(
        SE3, jnp.asarray(Q, dtype), jnp.asarray(R, dtype),
        jnp.asarray(P, dtype), jnp.asarray(q_ref, dtype),
        jnp.asarray(xi_ref, dtype))

    q0 = np.eye(4)
    q0[:3, 3] = [-1.0, -1.0, -0.2]
    xi0 = np.array([0.0, 0.0, 0.1, 2.0, 0.0, 0.2])
    return ({"dyn": dp, "cost": cp}, -10.0, 10.0,
            jnp.asarray(q0, dtype), jnp.asarray(xi0, dtype),
            jnp.asarray(q_ref, dtype), jnp.asarray(xi_ref, dtype))
