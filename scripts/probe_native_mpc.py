"""Native receding-horizon MPC vs the JAX closed-loop driver.

Same per-step semantics (H-window, warm-started fixed-budget solve, apply
u0): the two closed loops must produce the same applied controls and plant
trajectory to machine precision at f64.
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from trajectory_optimization_matrix_lie_groups_tpu import native
from trajectory_optimization_matrix_lie_groups_tpu.solvers.lie_ilqr import LieILQR
from trajectory_optimization_matrix_lie_groups_tpu.solvers.mpc import (
    make_closed_loop,
)
from trajectory_optimization_matrix_lie_groups_tpu.tasks.parity import (
    build_benchmark,
)

H, T, ITERS = 30, 25, 5

data, solver, params, x0, us0, _ = build_benchmark("se3_tracking", True)
cfg = dataclasses.replace(solver.cfg, N=H, max_iterations=ITERS,
                          tol_grad_norm=0.0, tol_d_norm=0.0,
                          backward="sequential_fixed")
eng = LieILQR(solver.model, cfg)
cp = params["cost"]
q0 = jnp.asarray(np.asarray(cp.q_ref[0]))
xi0 = jnp.asarray(np.asarray(cp.xi_ref[0])) + 0.05 * jnp.arange(6, dtype=jnp.float64)
ref = make_closed_loop(eng, T)(params, q0, xi0)

prob = data["prob"]
s = native.NativeSE3Solver(prob["J"], prob["dt"], prob["Q"], prob["R"],
                           prob["P"], np.asarray(cp.q_ref),
                           np.asarray(cp.xi_ref), iterations=ITERS)
mpc = native.NativeMPC(s, H)
qs, xis, us, J_pred = mpc.run(np.asarray(q0), np.asarray(xi0), T)

err_u = np.max(np.abs(us - np.asarray(ref.us)))
err_q = np.max(np.abs(qs - np.asarray(ref.qs)))
err_xi = np.max(np.abs(xis - np.asarray(ref.xis)))
# J conventions differ: LieILQR reports the post-rollout trajectory cost,
# the native executor (like FastBatchSolver) the last linearization-point
# cost — one extra rollout of improvement apart (~1e-6 relative here).
err_J = np.max(np.abs(J_pred - np.asarray(ref.J_pred)) / np.abs(np.asarray(ref.J_pred)))
print(f"applied-controls max err: {err_u:.3e}")
print(f"plant pose max err:       {err_q:.3e}")
print(f"plant twist max err:      {err_xi:.3e}")
print(f"predicted-J rel err:      {err_J:.3e}")
assert err_u < 1e-9 and err_q < 1e-9 and err_xi < 1e-9 and err_J < 1e-4
print("native MPC matches the JAX closed loop")
