"""Cross-check the native SO(3) MS-iLQR executor against the JAX engine.

Free-attitude (so3_tracking) and pendulum (pendulum_swingup) benchmark
problems, short horizon, per-iterate agreement with FastBatchSolver (f64,
XLA path).
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
from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SO3
from trajectory_optimization_matrix_lie_groups_tpu.solvers.batched import (
    FastBatchSolver,
)
from trajectory_optimization_matrix_lie_groups_tpu.tasks.parity import (
    build_benchmark,
    cut_reference,
)


def check(name, pendulum):
    H, ITERS, B = 30, 6, 2
    data, solver, params, x0, us0, _ = build_benchmark(name, True)
    prob = data["prob"]
    params = cut_reference(params, H)
    cp = params["cost"]
    dq = 0.05 * jax.random.normal(jax.random.PRNGKey(3), (B, 3))
    q0s = SO3.normalize(cp.q_ref[0][None] @ SO3.exp(dq))
    xi0s = jnp.broadcast_to(cp.xi_ref[0], (B, 3))
    fast = FastBatchSolver(solver.model, N=H, iterations=ITERS,
                           use_pallas=False)
    ref = fast.solve(params, q0s, xi0s, jnp.zeros((B, H, 3)),
                     cp.q_ref, cp.xi_ref)

    kw = {}
    if pendulum:
        kw = dict(pendulum=True, m=float(prob["m"]),
                  length=float(prob["length"]), g=9.8)
    s = native.NativeSO3Solver(prob["J"], prob["dt"], prob["Q"], prob["R"],
                               prob["P"], np.asarray(cp.q_ref),
                               np.asarray(cp.xi_ref), iterations=ITERS, **kw)
    us, J, g = s.solve_batch(np.asarray(q0s), np.asarray(xi0s))
    err_us = np.max(np.abs(us - np.asarray(ref.us)))
    err_J = np.max(np.abs(J - np.asarray(ref.J_opt)) / np.abs(np.asarray(ref.J_opt)))
    print(f"{name}: max|us - jax| = {err_us:.3e}  rel|J - jax| = {err_J:.3e}")
    assert err_us < 1e-8, err_us
    assert err_J < 1e-10, err_J


check("so3_tracking", pendulum=False)
check("pendulum_swingup", pendulum=True)
print("native SO3 executor matches the JAX engine")
