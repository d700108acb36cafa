"""Native AL (input-box constrained) batch solve vs ALFastSolver.

Same outer-loop semantics (per-problem multipliers, inner restart from us0,
first-order ascent + active-set penalty rebuild): the two engines must
produce the same constrained controls to machine precision at f64.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from trajectory_optimization_matrix_lie_groups_tpu import native
from trajectory_optimization_matrix_lie_groups_tpu.models import (
    constraints as cs,
    costs,
    dynamics,
)
from trajectory_optimization_matrix_lie_groups_tpu.models.base import make_model
from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3
from trajectory_optimization_matrix_lie_groups_tpu.solvers.al_fast import ALFastSolver
from trajectory_optimization_matrix_lie_groups_tpu.solvers.batched import (
    FastBatchSolver,
)
from trajectory_optimization_matrix_lie_groups_tpu.utils import load_benchmark_pickle

PKL = ("/root/reference/visualization/results_benchmark_2nd_draft/"
       "results_se3_tracking_benchmark.pkl")

data = load_benchmark_pickle(PKL)
prob = data["prob"]
H, B, ITERS = 60, 4, 25
q_ref = jnp.asarray(np.asarray(prob["q_ref"])[: H + 1])
xi_ref = jnp.asarray(np.asarray(prob["xi_ref"])[: H + 1].reshape(H + 1, 6))

dyn = dynamics.se3_dynamics()
dp = dynamics.se3_params(jnp.asarray(prob["J"]), float(prob["dt"]))
cd = costs.tracking_cost(SE3, 6)
cp = costs.tracking_cost_params(SE3, prob["Q"], prob["R"], prob["P"],
                                q_ref, xi_ref)

dq = 0.03 * jax.random.normal(jax.random.PRNGKey(2), (B, 6))
q0s = SE3.normalize(q_ref[0][None] @ SE3.exp(dq))
xi0s = jnp.broadcast_to(xi_ref[0], (B, 6)) + 0.05
us0 = jnp.zeros((B, H, 6))
lb, ub = -100.0, 100.0

constr = cs.input_box(12, 6)
constr_p = cs.input_box_params(lb, ub, 6)
al_cd = costs.al_cost(cd, constr)
model_c, _ = make_model(dyn, al_cd, dp, None)
alp = costs.al_init_params(cp, constr_p, H, constr.constr_size, mu0=1e-2)
inner = FastBatchSolver(model_c, N=H, iterations=ITERS, use_pallas=False)
al = ALFastSolver(inner, constr, tol_constr=1e-2)
ref = al.solve({"dyn": dp, "cost": alp}, q0s, xi0s, us0,
               q_ref=q_ref, xi_ref=xi_ref, n_al_iters=15)

s = native.NativeSE3Solver(prob["J"], prob["dt"], prob["Q"], prob["R"],
                           prob["P"], np.asarray(q_ref), np.asarray(xi_ref),
                           iterations=ITERS)
us, J, g, maxv, outer = s.solve_al(np.asarray(q0s), np.asarray(xi0s),
                                   lb, ub, n_al_iters=15)

err_us = np.max(np.abs(us - np.asarray(ref.us)))
err_mv = np.max(np.abs(maxv - np.asarray(ref.max_violation)))
print(f"outer iterations: native {outer} vs jax {ref.outer_iterations}")
print(f"controls max err:      {err_us:.3e}")
print(f"max-violation agree:   {err_mv:.3e}")
print(f"box respected: max u = {us.max():.3f}, min u = {us.min():.3f}")
assert outer == ref.outer_iterations
assert err_us < 1e-8
assert err_mv < 1e-9
assert us.max() <= ub + 1e-2 and us.min() >= lb - 1e-2
print("native AL executor matches ALFastSolver")
