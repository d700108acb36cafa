"""Input-box constrained solves on the fused lane-layout Pallas pipeline.

`ALFastSolver` runs the augmented-Lagrangian outer loop around the 3-kernel
`FastBatchSolver`; this module runs the same outer loop around the 2-kernel
`PallasPipelineSolver` — constrained MPC at the headline pipeline
throughput.  The AL terms enter the pipeline cheaply: the u-gradient
additions ride the `lu` XLA glue already computed between the two kernels,
and the penalty's diagonal Quu addition is one extra gridded input to the
Riccati kernel (`solvers/pipeline.py::_riccati_kernel_const`, ``al=True``).

Iterate-for-iterate identical to `ALFastSolver` with the same inner budget
(tests/test_al_pipeline.py): multipliers are per problem, inner solves
restart from the caller's ``us0`` each outer iteration (ref
traopt_controller.py:3237), and the update is the reference's first-order
ascent + active-set penalty rebuild (traopt_controller.py:3270-3290) with a
diagonal-Imu representation.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from trajectory_optimization_matrix_lie_groups_tpu.models.costs import (
    al_update_diag,
)
from trajectory_optimization_matrix_lie_groups_tpu.solvers.pipeline import (
    PallasPipelineSolver,
)


class ALPipelineResult(NamedTuple):
    qs: jnp.ndarray           # (B, N+1, 4, 4)
    xis: jnp.ndarray          # (B, N+1, 6)
    us: jnp.ndarray           # (B, N, nu)
    J_opt: jnp.ndarray        # (B,) augmented cost at last linearization
    lmbd: jnp.ndarray         # (B, N+1, 2nu) final multipliers
    max_violation: jnp.ndarray  # (B,)
    outer_iterations: int
    constr_converged: bool


class ALPipelineSolver:
    """AL outer loop around a PallasPipelineSolver (input box lb <= u <= ub)."""

    def __init__(self, pipe: PallasPipelineSolver, lb, ub,
                 mu0=1e-2, mu_scale=10.0, mu_max=1e8, tol_constr=1e-2):
        self.pipe = pipe
        # scalar or (nu,); broadcast at solve time when nu is known
        self.lb = np.asarray(lb, np.float64)
        self.ub = np.asarray(ub, np.float64)
        self.mu0 = mu0
        self.mu_scale = mu_scale
        self.mu_max = mu_max
        self.tol_constr = tol_constr

    def _violation(self, us):
        lb = np.broadcast_to(self.lb, (us.shape[-1],))
        ub = np.broadcast_to(self.ub, (us.shape[-1],))
        glo = lb[None, None] - us
        ghi = us - ub[None, None]
        g = jnp.concatenate([glo, ghi], axis=-1)  # (B, N, 2nu)
        # terminal g = 0 (models/constraints.py:38) -> max is >= 0
        return jnp.maximum(jnp.max(g, axis=(1, 2)), 0.0), g

    def solve(self, dyn, cost, q0s, xi0s, us0, n_al_iters=10):
        if n_al_iters < 1:
            raise ValueError("n_al_iters must be >= 1")
        B, N = us0.shape[0], us0.shape[1]
        nu = us0.shape[-1]
        C = 2 * nu
        lb = jnp.broadcast_to(jnp.asarray(self.lb), (nu,))
        ub = jnp.broadcast_to(jnp.asarray(self.ub), (nu,))
        lmbd = jnp.zeros((B, N + 1, C))
        imu = jnp.full((B, N + 1, C), self.mu0)
        mu = jnp.full((B,), self.mu0)
        st = None
        maxv = None
        converged = False
        outer = 0
        for outer in range(n_al_iters):
            st = self.pipe.solve(dyn, cost, q0s, xi0s, us0,
                                 al=(lb, ub, lmbd, imu))
            maxv, g_stage = self._violation(st.us)
            converged = bool(np.max(np.asarray(maxv)) < self.tol_constr)
            if converged:
                break
            # first-order ascent + active-set rebuild with per-problem
            # freeze; terminal g = 0 appended (costs.al_update_diag)
            g = jnp.concatenate(
                [g_stage, jnp.zeros((B, 1, C), g_stage.dtype)], axis=1)
            lmbd, imu, mu = al_update_diag(
                lmbd, imu, mu, g, self.mu_scale, self.mu_max,
                freeze=maxv < self.tol_constr)
        return ALPipelineResult(
            qs=st.qs, xis=st.xis, us=st.us, J_opt=st.J_opt, lmbd=lmbd,
            max_violation=maxv, outer_iterations=outer + 1,
            constr_converged=converged,
        )
