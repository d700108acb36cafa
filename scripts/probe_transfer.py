"""TPU probe: how much of the measured solve time is tunnel readback?

Times the bench solve with (a) full controls materialization (4.9 MB over
the remote tunnel), (b) per-problem first-control slice (24 KB — the MPC
consumer's actual readback), (c) a scalar reduction (8 B).  All three are
full completion barriers (the transferred value depends on the whole
computation); the differences are pure transfer cost.
"""
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
import bench

DTYPE = jnp.float32
# lane-layout probe: lane-safe tile/batch (bench's constants are the packed config)
B, TILE, CHUNK, ITERS = 8192, 256, 2, bench.ITERS
model, params, _, _, q_ref, xi_ref = bench.build_problem(DTYPE)
N = q_ref.shape[0] - 1
dt_static = float(bench.load_benchmark_pickle(bench.PKL)["prob"]["dt"])
q0_anchor = jnp.asarray(np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_q0.npy")), DTYPE)
xi0_anchor = jnp.asarray(np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_xi0.npy")), DTYPE)
us_golden = np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_us.npy"))
dp, cp = params["dyn"], params["cost"]
solver = PallasPipelineSolver(N=N, iterations=ITERS, dt=dt_static,
                              batch_tile=TILE, stage_chunk=CHUNK)
xi0s = jnp.broadcast_to(xi0_anchor, (B, 6)).astype(DTYPE)
us0 = jnp.zeros((B, N, 6), dtype=DTYPE)

def mk(seed):
    dq = 0.05 * jax.random.normal(jax.random.PRNGKey(seed), (B, 6), dtype=DTYPE)
    return SE3.normalize(q0_anchor[None] @ SE3.exp(dq)).at[0].set(q0_anchor)

reps = 4
batches = [jax.device_put(mk(r)) for r in range(reps + 1)]
jax.block_until_ready(batches)

out = solver.solve(dp, cp, batches[0], xi0s, us0)
_ = np.asarray(out.us)  # compile
err = float(np.max(np.abs(np.asarray(out.us[0], np.float64) - us_golden)))
print(json.dumps({"sanity_err_vs_golden": err}), flush=True)

BARRIERS = {
    "full_us_4.9MB": lambda o: np.asarray(o.us),
    "first_controls_24KB": lambda o: np.asarray(o.us[:, 0, :]),
    "scalar_8B": lambda o: float(jnp.sum(o.us[:, 0, 0])),
}
for name, barrier in BARRIERS.items():
    best = np.inf
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        o = solver.solve(dp, cp, batches[r], xi0s, us0)
        barrier(o)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"barrier": name, "ms_per_solve_batch": round(best * 1e3, 1),
                      "solves_per_s": round(B / best, 1)}), flush=True)

# fused vs unfused A/B with the slice barrier (transfer noise excluded)
for fused in (True, False):
    s2 = PallasPipelineSolver(N=N, iterations=ITERS, dt=dt_static,
                              batch_tile=TILE, stage_chunk=CHUNK, fused=fused)
    o = s2.solve(dp, cp, batches[0], xi0s, us0)
    _ = np.asarray(o.us[:, 0, :])  # compile
    best = np.inf
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        o = s2.solve(dp, cp, batches[r], xi0s, us0)
        _ = np.asarray(o.us[:, 0, :])
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"fused": fused,
                      "ms_per_solve_batch": round(best * 1e3, 1),
                      "solves_per_s": round(B / best, 1)}), flush=True)
