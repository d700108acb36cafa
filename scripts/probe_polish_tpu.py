"""TPU probe: does the emulated-f64 polish compile/run through the tunnel?

Measures accuracy + wall time of HighPrecisionSolver (f32 pipeline + 2 f64
XLA polish iterations) on the N=200 bench problem at a small batch.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/traopt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import bench
from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3
from trajectory_optimization_matrix_lie_groups_tpu.solvers.polish import HighPrecisionSolver

print("backend:", jax.default_backend(), flush=True)
B = int(os.environ.get("B", "64"))

model, params, _, _, q_ref, xi_ref = bench.build_problem(jnp.float64)
N = q_ref.shape[0] - 1
us_golden = np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_us.npy"))
q0 = jnp.asarray(np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_q0.npy")))
xi0 = jnp.asarray(np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_xi0.npy")))

dq = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (B, 6))
q0s = SE3.normalize(q0[None] @ SE3.exp(dq)).at[0].set(q0)
xi0s = jnp.broadcast_to(xi0, (B, 6))
us0 = jnp.zeros((B, N, 6))

hp = HighPrecisionSolver(model, N=N, iterations=12, dt=float(params["dyn"].dt),
                         polish_iters=2,
                         interpret=jax.default_backend() != "tpu")
t0 = time.perf_counter()
out = hp.solve(params, q0s, xi0s, us0)
us = np.asarray(out.us)
print(f"compile+first run: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
out = hp.solve(params, q0s, xi0s, us0)
us = np.asarray(out.us)
dt = time.perf_counter() - t0
err = float(np.max(np.abs(us[0] - us_golden)))
print(f"B={B} solve: {dt*1e3:.1f} ms -> {B/dt:.0f} solves/s, "
      f"us_max_err={err:.3e}", flush=True)
