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
        self._ls_inner = None

    def _ls_solver(self) -> FastBatchSolver:
        """Line-searched twin of the fast inner (built lazily, cached).

        Used by the batched rescue: same model/N, merit line search on, a
        larger iteration budget, and no Pallas rollout/linearize fusions
        (the candidate rollouts run under a vmap over the alpha ladder;
        the Pallas backward is still used when the inner uses it)."""
        if self._ls_inner is None:
            inner = self.inner
            self._ls_inner = FastBatchSolver(
                inner.model, inner.N,
                iterations=max(inner.iterations, 60),
                use_pallas=inner.use_pallas, interpret=inner.interpret,
                line_search=True)
        return self._ls_inner

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

        ``rescue``: re-solve any still-unconverged problems with the
        line-searched batched inner (`FastBatchSolver(line_search=True)`).
        The fast inner (fixed budget, mu = 0, alpha = 1) can limit-cycle on
        problems whose unconstrained optimum is far outside the box; the
        merit line search converges those (verified on the al_batch
        workload's hard lanes), and the re-solve runs all failing lanes as
        ONE batched program rather than serial per-lane solves."""
        al = params["cost"]
        if q_ref is None:
            q_ref = al.cost.q_ref
        if xi_ref is None:
            xi_ref = al.cost.xi_ref
        if n_al_iters < 1:
            raise ValueError("n_al_iters must be >= 1")
        st, al, constr_eval, converged, outer = self._outer_loop(
            self.inner, params["dyn"], al, q0s, xi0s, us0, q_ref, xi_ref,
            n_al_iters)
        qs, xis, us, J_opt = st.qs, st.xis, st.us, st.J_opt
        if rescue and not converged:
            qs, xis, us, J_opt, constr_eval = self._rescue(
                params, q0s, xi0s, us0, qs, xis, us, J_opt, constr_eval,
                q_ref, xi_ref, n_al_iters)
            converged = bool(
                np.max(np.asarray(constr_eval)) < self.tol_constr)
        return ALFastResult(
            qs=qs, xis=xis, us=us, J_opt=J_opt, al_params=al,
            constr_eval=constr_eval,
            max_violation=jnp.max(constr_eval, axis=(1, 2)),
            outer_iterations=outer + 1, constr_converged=converged,
        )

    def _outer_loop(self, inner, dyn_params, al, q0s, xi0s, us0, q_ref,
                    xi_ref, n_al_iters):
        """The AL outer loop (ref fit:3218) around a given batched inner."""
        st = None
        constr_eval = None
        converged = False
        outer = 0
        for outer in range(n_al_iters):
            st = inner.solve({"dyn": dyn_params, "cost": al},
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
        return st, al, constr_eval, converged, outer

    def _rescue(self, params, q0s, xi0s, us0, qs, xis, us, J_opt,
                constr_eval, q_ref, xi_ref, n_al_iters):
        """Batched re-solve of unconverged lanes (see ``solve``)."""
        al0 = params["cost"]
        maxv = np.asarray(jnp.max(constr_eval, axis=(1, 2)))
        bad = np.where(maxv >= self.tol_constr)[0]
        st_b, _, ce_b, _, _ = self._outer_loop(
            self._ls_solver(), params["dyn"], al0,
            jnp.asarray(q0s)[bad], jnp.asarray(xi0s)[bad],
            jnp.asarray(us0)[bad], q_ref, xi_ref,
            max(n_al_iters, 20))
        # np.asarray of a jax array is a read-only view; copy for patching
        qs, xis, us = (np.array(qs), np.array(xis), np.array(us))
        J_opt = np.array(J_opt)
        constr_eval = np.array(constr_eval)
        qs[bad], xis[bad], us[bad] = (np.asarray(st_b.qs),
                                      np.asarray(st_b.xis),
                                      np.asarray(st_b.us))
        J_opt[bad] = np.asarray(st_b.J_opt)
        constr_eval[bad] = np.asarray(ce_b)
        return (jnp.asarray(qs), jnp.asarray(xis), jnp.asarray(us),
                jnp.asarray(J_opt), jnp.asarray(constr_eval))
