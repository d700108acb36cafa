"""TPU throughput + accuracy of the drone-family Pallas pipeline."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/traopt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp
from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3
from trajectory_optimization_matrix_lie_groups_tpu.solvers.pipeline import PallasPipelineSolver
from trajectory_optimization_matrix_lie_groups_tpu.tasks.parity import build_benchmark

DTYPE = jnp.float32
data, solver, params, x0, us0, _ = build_benchmark("drone_racing", True)
to32 = lambda t: jax.tree.map(
    lambda x: jnp.asarray(x, DTYPE) if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, t)
params = to32(params)
cp, dp = params["cost"], params["dyn"]
N = cp.q_ref.shape[0] - 1
ITERS = 12
us_ref = np.asarray(data["us"][-1]) if "us" in data else None

for B, tile in [(1024, 512), (2048, 512)]:
    pipe = PallasPipelineSolver(N=N, iterations=ITERS, dt=float(dp.dt),
                                batch_tile=tile, gravity=True)
    def mk(seed):
        dq = 0.03 * jax.random.normal(jax.random.PRNGKey(seed), (B, 6), dtype=DTYPE)
        qs = SE3.normalize(cp.q_ref[0][None] @ SE3.exp(dq))
        return qs.at[0].set(jnp.asarray(np.asarray(data["prob"]["x0"][0]), DTYPE))
    xi0s = jnp.broadcast_to(jnp.asarray(np.asarray(data["prob"]["x0"][1]).reshape(6), DTYPE), (B, 6))
    us0s = jnp.zeros((B, N, 4), DTYPE)
    reps = 3
    batches = [jax.device_put(mk(r)) for r in range(reps + 1)]
    jax.block_until_ready(batches)
    try:
        t0 = time.perf_counter()
        out = pipe.solve(dp, cp, batches[0], xi0s, us0s)
        _ = np.asarray(out.us)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for r in range(1, reps + 1):
            out = pipe.solve(dp, cp, batches[r], xi0s, us0s)
            _ = np.asarray(out.us)
        dt = (time.perf_counter() - t0) / reps
        res = {"B": B, "tile": tile, "solves_per_s": round(B / dt, 1),
               "ms": round(dt * 1e3, 1), "compile_s": round(tc, 1),
               "J0": float(out.J_opt[0])}
        if us_ref is not None and us_ref.shape[0] >= N:
            res["us0_vs_ref"] = float(np.max(np.abs(
                np.asarray(out.us[0], np.float64) - us_ref[:N])))
        print(json.dumps(res), flush=True)
    except Exception as e:
        print(json.dumps({"B": B, "tile": tile, "error": str(e)[:300]}), flush=True)
