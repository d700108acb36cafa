"""TPU probe: sublane-packed batch layout (round-5 roofline attack).

The f32 pipeline is VPU-issue-bound at 21% of its HBM roofline (records
name=roofline_f32_df): lane-layout ops are (d, bt) slices at d/8 sublane
utilization (d = 1 for the Cholesky chains).  `sublanes=8` packs the batch
over BOTH vreg axes — trailing (8, bt/8) — so every op is a dense (8, 128)
vreg.  This probe times the bench headline config against sublane-packed
variants (lane tiles need bt >= 1024 so the lane axis still fills 128).

Record: bench_records name=sublane_layout.
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
from trajectory_optimization_matrix_lie_groups_tpu.utils.records import record
import bench

DTYPE = jnp.float32
model, params, _, _, q_ref, xi_ref = bench.build_problem(DTYPE)
N = q_ref.shape[0] - 1
dt_static = float(bench.load_benchmark_pickle(bench.PKL)["prob"]["dt"])
q0_anchor = jnp.asarray(np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_q0.npy")), DTYPE)
xi0_anchor = jnp.asarray(np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_xi0.npy")), DTYPE)
us_golden = np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_us.npy"))
dp, cp = params["dyn"], params["cost"]

# (B, tile, chunk, sublanes); lane baseline first
CONFIGS = [
    (8192, 256, 4, 1),
    (8192, 1024, 1, 8),
    (8192, 1024, 2, 8),
    (8192, 2048, 1, 8),
    (8192, 1024, 4, 8),
]
if os.environ.get("CONFIGS"):
    CONFIGS = [tuple(int(v) for v in c.split("x"))
               for c in os.environ["CONFIGS"].split(",")]

for B, tile, chunk, S in CONFIGS:
    try:
        solver = PallasPipelineSolver(N=N, iterations=bench.ITERS, dt=dt_static,
                                      interpret=False, batch_tile=tile,
                                      stage_chunk=chunk, sublanes=S)
        xi0s = jnp.broadcast_to(xi0_anchor, (B, 6)).astype(DTYPE)
        us0 = jnp.zeros((B, N, 6), dtype=DTYPE)
        def mk(seed):
            dq = 0.05 * jax.random.normal(jax.random.PRNGKey(seed), (B, 6), dtype=DTYPE)
            return SE3.normalize(q0_anchor[None] @ SE3.exp(dq)).at[0].set(q0_anchor)
        reps = 3
        batches = [jax.device_put(mk(r)) for r in range(reps + 2)]
        jax.block_until_ready(batches)
        t0 = time.perf_counter()
        out = solver.solve(dp, cp, batches[0], xi0s, us0)
        _ = np.asarray(out.us)
        t_compile = time.perf_counter() - t0
        # priming rep (rep-cliff, records name=rep_cliff_probe)
        out = solver.solve(dp, cp, batches[1], xi0s, us0)
        _ = np.asarray(out.us[:, 0, :])
        dt = np.inf
        for r in range(2, reps + 2):
            t0 = time.perf_counter()
            out = solver.solve(dp, cp, batches[r], xi0s, us0)
            _ = np.asarray(out.us[:, 0, :])  # MPC readback barrier (bench.py)
            dt = min(dt, time.perf_counter() - t0)
        err = float(np.max(np.abs(np.asarray(out.us[0], np.float64) - us_golden)))
        result = {"B": B, "tile": tile, "chunk": chunk, "sublanes": S,
                  "solves_per_s": round(B / dt, 1),
                  "t_solve_s": round(dt, 4),
                  "t_compile_s": round(t_compile, 1),
                  "err": err}
        print(json.dumps(result), flush=True)
        record("sublane_layout", result)
    except Exception as e:
        print(json.dumps({"B": B, "tile": tile, "chunk": chunk, "sublanes": S,
                          "error": repr(e)[:300]}), flush=True)
