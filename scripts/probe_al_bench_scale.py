"""Does bench-scale constrained SE(3) tracking (N=200, box +-100) converge?

probe_al_tpu showed 0/4096 lanes at 1e-2 violation after 6 AL outers on the
fixed-budget (alpha = 1) inner.  This CPU probe isolates why, comparing on
a small batch:

  A. fixed-budget inner, 15 outers        (is it just under-budgeted?)
  B. line-searched inner, 15 outers       (or does alpha = 1 limit-cycle?)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

import bench
from trajectory_optimization_matrix_lie_groups_tpu.models import (
    constraints as cs,
    costs,
)
from trajectory_optimization_matrix_lie_groups_tpu.models.base import make_model
from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3
from trajectory_optimization_matrix_lie_groups_tpu.solvers.al_fast import ALFastSolver
from trajectory_optimization_matrix_lie_groups_tpu.solvers.batched import (
    FastBatchSolver,
)

B, H = 4, bench.HORIZON
model, params, _, _, q_ref, xi_ref = bench.build_problem(jnp.float64, horizon=H)
dp, cp = params["dyn"], params["cost"]
q0_anchor = jnp.asarray(
    np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_q0.npy")))
xi0_anchor = jnp.asarray(
    np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_xi0.npy")))
dq = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (B, 6))
q0s = SE3.normalize(q0_anchor[None] @ SE3.exp(dq))
xi0s = jnp.broadcast_to(xi0_anchor, (B, 6))
us0 = jnp.zeros((B, H, 6))

constr = cs.input_box(12, 6)

# rebuild the al model from the bench cost def
from trajectory_optimization_matrix_lie_groups_tpu.models import dynamics as dyn_m

dyn = dyn_m.se3_dynamics()
cd = costs.tracking_cost(SE3, 6)
al_cd = costs.al_cost(cd, constr)
model_c, _ = make_model(dyn, al_cd, dp, None)
alp = costs.al_init_params(cp, cs.input_box_params(-100.0, 100.0, 6), H,
                           constr.constr_size, mu0=1e-2)

for label, ls in [("fixed-budget", False), ("line-searched", True)]:
    inner = FastBatchSolver(model_c, N=H, iterations=bench.ITERS,
                            use_pallas=False, line_search=ls)
    al = ALFastSolver(inner, constr, tol_constr=1e-2)
    res = al.solve({"dyn": dp, "cost": alp}, q0s, xi0s, us0, n_al_iters=15)
    mv = np.asarray(res.max_violation)
    print(f"{label:14s} outers={res.outer_iterations:2d} "
          f"lanes={int((mv < 1e-2).sum())}/{B} maxv={mv.max():.3e} "
          f"u=[{float(res.us.min()):.1f},{float(res.us.max()):.1f}]")
