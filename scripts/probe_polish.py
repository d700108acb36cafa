"""Does a short f64 'polish' from the f32-converged point recover accuracy?

f32 noise injected at every stage puts a ~1e-3 floor on us (see
probe_f32_precision.py).  But iLQR is locally contractive: a few accurate
iterations warm-started from the f32 answer should re-converge to the f64
fixed point.  This probe measures error vs the f64 golden after
12 f32 iterations + k in {0,1,2,3,4} f64 iterations.
"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from trajectory_optimization_matrix_lie_groups_tpu.solvers.batched import FastBatchSolver
import bench

us_golden = np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_us.npy"))
q0 = jnp.asarray(np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_q0.npy")))
xi0 = jnp.asarray(np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_xi0.npy")))

model32, params32, _, _, q_ref, xi_ref = bench.build_problem(jnp.float32)
model64, params64, _, _, _, _ = bench.build_problem(jnp.float64)
N = q_ref.shape[0] - 1

s32 = FastBatchSolver(model32, N=N, iterations=12, use_pallas=False)
out = s32.solve(params32, q0[None].astype(jnp.float32),
                xi0[None].astype(jnp.float32),
                jnp.zeros((1, N, 6), jnp.float32),
                jnp.asarray(q_ref, jnp.float32),
                jnp.asarray(xi_ref, jnp.float32))
err0 = float(np.max(np.abs(np.asarray(out.us[0], np.float64) - us_golden)))
print(f"f32 x12                      us_max_err = {err0:.3e}", flush=True)

s64 = FastBatchSolver(model64, N=N, iterations=1, use_pallas=False)
c64 = lambda x: jnp.asarray(np.asarray(x), jnp.float64)
qs, xis, us = c64(out.qs), c64(out.xis), c64(out.us)
it = jax.jit(s64._iteration)
for k in range(1, 5):
    qs, xis, us, J, grad = it(params64, qs, xis, us)
    err = float(np.max(np.abs(np.asarray(us[0]) - us_golden)))
    print(f"f32 x12 + f64 x{k}             us_max_err = {err:.3e}", flush=True)
