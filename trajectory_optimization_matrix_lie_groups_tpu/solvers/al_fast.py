"""Batched augmented-Lagrangian MS-iLQR: constrained MPC at throughput.

The reference's constrained solver (`AL_iLQR_Tracking_SE3_MS`,
traopt_controller.py:3139-3293) solves ONE problem per process.  This module
runs the same AL outer loop around the batch-explicit `FastBatchSolver`, so
thousands of input-constrained problems (perturbed MPC instances) solve
simultaneously on one chip:

    outer k:  inner fixed-budget batched MS-iLQR solve (Pallas backward)
              -> per-problem constraint evaluation g (B, N+1, c)
              -> per-problem multiplier ascent + active-set penalty rebuild
                 (models.costs.al_update_params, broadcast over the batch)
              -> stop when every problem satisfies max g < tol

The AL state rides in the cost params pytree: after the first update the
multipliers are per-problem (B, N+1, c) and the inner solver re-jits once
for the batched-params shapes; subsequent outer iterations reuse both
traces.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from trajectory_optimization_matrix_lie_groups_tpu.models import costs
from trajectory_optimization_matrix_lie_groups_tpu.models.constraints import (
    ConstraintDef,
)
from trajectory_optimization_matrix_lie_groups_tpu.solvers.batched import (
    FastBatchSolver,
)


class ALFastResult(NamedTuple):
    qs: jnp.ndarray          # (B, N+1, 4, 4)
    xis: jnp.ndarray         # (B, N+1, 6)
    us: jnp.ndarray          # (B, N, nu)
    J_opt: jnp.ndarray       # (B,)
    al_params: costs.ALParams
    constr_eval: jnp.ndarray  # (B, N+1, c)
    max_violation: jnp.ndarray  # (B,)
    outer_iterations: int
    constr_converged: bool


class ALFastSolver:
    """AL outer loop around a FastBatchSolver built with the al_cost model."""

    def __init__(self, inner: FastBatchSolver, constraint: ConstraintDef,
                 mu_scale=10.0, mu_max=1e8, tol_constr=1e-2):
        self.inner = inner
        self.constraint = constraint
        self.mu_scale = mu_scale
        self.mu_max = mu_max
        self.tol_constr = tol_constr

    def _eval_constraints(self, al: costs.ALParams, qs, xis, us):
        """Batched stage-wise g + terminal (ref :3242-3248)."""
        N = us.shape[-2]
        idx = jnp.arange(N)
        g_stage = self.constraint.g(al.constr, qs[:, :-1], xis[:, :-1], us,
                                    idx, False)
        u_term = jnp.zeros_like(us[:, 0])
        g_term = self.constraint.g(al.constr, qs[:, -1], xis[:, -1], u_term,
                                   N, True)
        return jnp.concatenate([g_stage, g_term[:, None]], axis=1)

    def solve(self, params, q0s, xi0s, us0, q_ref=None, xi_ref=None,
              n_al_iters=10, rescue=False):
        """params: {'dyn': ..., 'cost': ALParams}; batched initial states.

        Mirrors ref `fit:3218` (inner restarts from `us0` each outer
        iteration, traopt_controller.py:3237).

        ``rescue``: re-solve any still-unconverged problems with the robust
        single-problem path (ALILQR around a line-searched, LM-regularized
        LieILQR).  The fast inner (fixed budget, mu = 0, alpha = 1) can
        limit-cycle on problems whose unconstrained optimum is far outside
        the box; the robust inner converges those (verified on the al_batch
        workload's hard lanes) at serial cost, so it is applied only to the
        failing few."""
        al = params["cost"]
        if q_ref is None:
            q_ref = al.cost.q_ref
        if xi_ref is None:
            xi_ref = al.cost.xi_ref
        if n_al_iters < 1:
            raise ValueError("n_al_iters must be >= 1")
        st = None
        constr_eval = None
        converged = False
        outer = 0
        for outer in range(n_al_iters):
            st = self.inner.solve({"dyn": params["dyn"], "cost": al},
                                  q0s, xi0s, us0, q_ref, xi_ref)
            constr_eval = self._eval_constraints(al, st.qs, st.xis, st.us)
            max_v = jnp.max(constr_eval, axis=(1, 2))
            converged = bool(np.max(np.asarray(max_v)) < self.tol_constr)
            if converged:
                break
            # per-problem freeze: stop updating problems already satisfying
            # the tolerance (see costs.al_update_params docstring)
            al = costs.al_update_params(al, constr_eval, self.mu_scale,
                                        self.mu_max,
                                        freeze=max_v < self.tol_constr)
        qs, xis, us, J_opt = st.qs, st.xis, st.us, st.J_opt
        if rescue and not converged:
            qs, xis, us, J_opt, constr_eval = self._rescue(
                params, q0s, xi0s, us0, qs, xis, us, J_opt, constr_eval,
                n_al_iters)
            converged = bool(
                np.max(np.asarray(constr_eval)) < self.tol_constr)
        return ALFastResult(
            qs=qs, xis=xis, us=us, J_opt=J_opt, al_params=al,
            constr_eval=constr_eval,
            max_violation=jnp.max(constr_eval, axis=(1, 2)),
            outer_iterations=outer + 1, constr_converged=converged,
        )

    def _rescue(self, params, q0s, xi0s, us0, qs, xis, us, J_opt,
                constr_eval, n_al_iters):
        """Robust re-solve of unconverged lanes (see ``solve``)."""
        from trajectory_optimization_matrix_lie_groups_tpu.solvers.al_ilqr import (
            ALILQR,
        )
        from trajectory_optimization_matrix_lie_groups_tpu.solvers.lie_ilqr import (
            LieILQR,
            SolverConfig,
        )

        al0 = params["cost"]
        maxv = np.asarray(jnp.max(constr_eval, axis=(1, 2)))
        bad = np.where(maxv >= self.tol_constr)[0]
        H = us0.shape[1]
        cfg = SolverConfig(N=H, multiple_shooting=True, line_search=True,
                           rollout="nonlinear", max_iterations=120,
                           tol_grad_norm=1e-8, tol_d_norm=1e-6)
        eng = LieILQR(self.inner.model, cfg)
        robust = ALILQR(eng, self.constraint, mu_scale=self.mu_scale,
                        mu_max=self.mu_max, tol_constr=self.tol_constr)
        # np.asarray of a jax array is a read-only view; copy for patching
        qs, xis, us = (np.array(qs), np.array(xis), np.array(us))
        J_opt = np.array(J_opt)
        constr_eval = np.array(constr_eval)
        for b in bad:
            out = robust.fit({"dyn": params["dyn"], "cost": al0},
                             (q0s[b], xi0s[b]), us0[b],
                             n_al_iters=max(n_al_iters, 20),
                             n_ilqr_iters=120)
            qs[b], xis[b], us[b] = (np.asarray(out.qs), np.asarray(out.xis),
                                    np.asarray(out.us))
            # augmented cost of the rescued trajectory (last inner's final J)
            J_opt[b] = float(out.inner_histories[-1]["J"][-1])
            constr_eval[b] = np.asarray(out.constr_eval)
        return (jnp.asarray(qs), jnp.asarray(xis), jnp.asarray(us),
                jnp.asarray(J_opt), jnp.asarray(constr_eval))
