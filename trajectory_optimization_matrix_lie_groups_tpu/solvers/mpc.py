"""Receding-horizon MPC driver over the MS-iLQR engine.

The reference has no MPC loop (its `fit` is open-loop); BASELINE.json's
north-star metric is MPC solve throughput, so this module provides the
closed-loop driver: at each plant step, slice an H-step reference window out
of the full path (`lax.dynamic_slice` — no retracing), warm-start from the
shifted previous solution, run a fixed iLQR iteration budget, apply u0.

`make_closed_loop` returns a fully-jitted function that scans the whole
closed-loop simulation on-device — plant rollout, window slicing, and every
inner solve fused into one XLA program (zero host sync per step).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from trajectory_optimization_matrix_lie_groups_tpu.models import costs
from trajectory_optimization_matrix_lie_groups_tpu.solvers.lie_ilqr import (
    LieILQR,
    SolverConfig,
)


class MPCResult(NamedTuple):
    qs: jnp.ndarray      # (T+1, m, m) closed-loop plant trajectory
    xis: jnp.ndarray     # (T+1, d)
    us: jnp.ndarray      # (T, nu) applied controls
    J_pred: jnp.ndarray  # (T,) predicted cost per solve


def make_closed_loop(solver: LieILQR, T: int):
    """Build a jitted closed-loop simulator.

    Args:
      solver: a LieILQR whose cost params carry an (H+1)-window reference
        (the per-step window is written into ``params['cost']``).
      T: number of closed-loop plant steps; the full reference must have at
        least T + H + 1 entries.

    Returns:
      run(params_full, q0, xi0): params_full's cost entry holds the FULL
        reference path; returns an MPCResult.
    """
    H = solver.cfg.N
    model = solver.model
    g = model.group

    def window(cp: costs.TrackingCostParams, t):
        sl = lambda a: lax.dynamic_slice_in_dim(a, t, H + 1, axis=0)
        return cp._replace(
            q_ref=sl(cp.q_ref), q_ref_inv=sl(cp.q_ref_inv),
            Ad_ref=sl(cp.Ad_ref), xi_ref=sl(cp.xi_ref),
        )

    def run(params_full, q0, xi0):
        cp_full = params_full["cost"]
        nu = model.nu

        def mpc_step(carry, t):
            q, xi, us_warm = carry
            cp_t = window(cp_full, t)
            params_t = {**params_full, "cost": cp_t}
            state = solver._init_state_ms(q, xi, us_warm, cp_t.q_ref, cp_t.xi_ref)
            state = solver._solve_loop(params_t, state)
            u0 = state.us[0]
            q_next, xi_next = model.step(params_t, q, xi, u0, 0)
            # warm start: shift one step, repeat the tail control
            us_next = jnp.concatenate([state.us[1:], state.us[-1:]], axis=0)
            return (q_next, xi_next, us_next), (q_next, xi_next, u0, state.J_opt)

        us0 = jnp.zeros((H, nu), dtype=xi0.dtype)
        (_, _, _), (qs_t, xis_t, us_applied, J_pred) = lax.scan(
            mpc_step, (q0, xi0, us0), jnp.arange(T))
        qs = jnp.concatenate([q0[None], qs_t], axis=0)
        xis = jnp.concatenate([xi0[None], xis_t], axis=0)
        return MPCResult(qs=qs, xis=xis, us=us_applied, J_pred=J_pred)

    return jax.jit(run)
