"""TPU throughput of FastBatchSolver on the drone-racing problem (nu=4)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/traopt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp
from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3
from trajectory_optimization_matrix_lie_groups_tpu.solvers.batched import FastBatchSolver
from trajectory_optimization_matrix_lie_groups_tpu.tasks.parity import build_benchmark

DTYPE = jnp.float32
data, solver, params, x0, us0, _ = build_benchmark("drone_racing", True)
to32 = lambda t: jax.tree.map(
    lambda x: jnp.asarray(x, DTYPE) if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, t)
params = to32(params)
cp = params["cost"]
N = cp.q_ref.shape[0] - 1
ITERS = 12
print("N =", N, flush=True)

for B, use_pallas in [(512, True), (1024, True)]:
    fast = FastBatchSolver(solver.model, N=N, iterations=ITERS, use_pallas=use_pallas)
    def mk(seed):
        dq = 0.03 * jax.random.normal(jax.random.PRNGKey(seed), (B, 6), dtype=DTYPE)
        return SE3.normalize(cp.q_ref[0][None] @ SE3.exp(dq))
    xi0s = jnp.broadcast_to(cp.xi_ref[0], (B, 6)).astype(DTYPE)
    us0s = jnp.zeros((B, N, 4), DTYPE)
    reps = 3
    batches = [jax.device_put(mk(r)) for r in range(reps + 1)]
    jax.block_until_ready(batches)
    try:
        t0 = time.perf_counter()
        out = fast.solve(params, batches[0], xi0s, us0s, cp.q_ref, cp.xi_ref)
        _ = np.asarray(out.us)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for r in range(1, reps + 1):
            out = fast.solve(params, batches[r], xi0s, us0s, cp.q_ref, cp.xi_ref)
            _ = np.asarray(out.us)
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"B": B, "pallas": use_pallas,
                          "solves_per_s": round(B / dt, 1),
                          "ms": round(dt * 1e3, 1), "compile_s": round(tc, 1),
                          "J0": float(out.J_opt[0])}), flush=True)
    except Exception as e:
        print(json.dumps({"B": B, "pallas": use_pallas, "error": str(e)[:200]}), flush=True)
