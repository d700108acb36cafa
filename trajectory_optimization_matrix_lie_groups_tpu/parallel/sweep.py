"""Initial-condition perturbation sweeps as one sharded SPMD program.

Replaces `visualization/perturb_all_compute.py`: the reference fans out one
OS process per (parameter, value) pair with `joblib.Parallel`
(`perturb_all_compute.py:245`), each running a full serial SE(3) iLQR solve.
Here the entire sweep — 12 parameters x O(100) values, each a full solve —
is a single vmapped, mesh-sharded computation: the only cross-device traffic
is the result gather.

Parameter semantics mirror the reference (`perturb_all_compute.py:44-110`):
each sweep point perturbs exactly one component of the initial state —
Euler angles of the initial attitude (th_z/th_y/th_x, degrees), angular
velocity (w_*), position (p_*), or linear velocity (v_*).
"""

from typing import Dict, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from trajectory_optimization_matrix_lie_groups_tpu.ops import se3, so3
from trajectory_optimization_matrix_lie_groups_tpu.parallel.batch import BatchSolver

PARAM_NAMES = ("th_z", "th_y", "th_x", "w_x", "w_y", "w_z",
               "p_x", "p_y", "p_z", "v_x", "v_y", "v_z")


class SweepResult(NamedTuple):
    param: str
    values: np.ndarray
    J_opt: np.ndarray       # (n_values,)
    grad_norm: np.ndarray
    converged: np.ndarray
    us: np.ndarray          # (n_values, N, nu)


def _euler_zyx_matrix(th_z, th_y, th_x):
    """Intrinsic z-y-x Euler rotation (degrees), batched."""
    rz = jnp.deg2rad(th_z)
    ry = jnp.deg2rad(th_y)
    rx = jnp.deg2rad(th_x)
    Rz = so3.exp(jnp.stack([jnp.zeros_like(rz), jnp.zeros_like(rz), rz], axis=-1))
    Ry = so3.exp(jnp.stack([jnp.zeros_like(ry), ry, jnp.zeros_like(ry)], axis=-1))
    Rx = so3.exp(jnp.stack([rx, jnp.zeros_like(rx), jnp.zeros_like(rx)], axis=-1))
    return Rz @ Ry @ Rx


def build_x0_batch(param: str, values, base_q0, base_xi0):
    """Batch of initial states perturbing one parameter (others at base)."""
    values = jnp.asarray(values)
    B = values.shape[0]
    q0 = jnp.broadcast_to(jnp.asarray(base_q0), (B, 4, 4))
    xi0 = jnp.broadcast_to(jnp.asarray(base_xi0), (B, 6))
    if param.startswith("th_"):
        zeros = jnp.zeros_like(values)
        ang = {a: zeros for a in ("th_z", "th_y", "th_x")}
        ang[param] = values
        R = _euler_zyx_matrix(ang["th_z"], ang["th_y"], ang["th_x"])
        q0 = jax.vmap(se3.from_rotation_translation)(R, se3.translation(q0))
    else:
        idx = {"w_x": 0, "w_y": 1, "w_z": 2, "v_x": 3, "v_y": 4, "v_z": 5}
        if param in ("w_x", "w_y", "w_z", "v_x", "v_y", "v_z"):
            xi0 = xi0.at[:, idx[param]].set(values)
        elif param in ("p_x", "p_y", "p_z"):
            j = {"p_x": 0, "p_y": 1, "p_z": 2}[param]
            p = se3.translation(q0).at[:, j].set(values)
            q0 = jax.vmap(se3.from_rotation_translation)(se3.rotation(q0), p)
        else:
            raise ValueError(param)
    return q0, xi0


def run_sweep(batch_solver: BatchSolver, params, parameter_ranges: Dict,
              base_q0, base_xi0, nu=6):
    """Run all parameter sweeps; each range is one sharded batch solve."""
    N = batch_solver.solver.cfg.N
    out = {}
    for name, values in parameter_ranges.items():
        q0s, xi0s = build_x0_batch(name, values, base_q0, base_xi0)
        us0 = jnp.zeros((q0s.shape[0], N, nu), dtype=xi0s.dtype)
        st = batch_solver.solve_batch(params, q0s, xi0s, us0)
        out[name] = SweepResult(
            param=name, values=np.asarray(values),
            J_opt=np.asarray(st.J_opt), grad_norm=np.asarray(st.grad_norm),
            converged=np.asarray(st.converged), us=np.asarray(st.us),
        )
    return out
