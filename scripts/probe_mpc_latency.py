"""TPU record: single-instance MPC latency vs batch size (round-5 VERDICT 3).

Every prior TPU record is batch throughput; a real-time MPC consumer (the
reference's use case, benchmark_drone_racing_tracking.py:47-58) cares about
the latency of ONE receding-horizon solve.  This probe measures wall-clock
per solve call at B in {1, 64, 256, 1024, 8192} for the N=200 f32 pipeline
(12 iters) and for the gate-passing mixed polish (f32x7+df2), through the
axon tunnel (the measured latency INCLUDES the tunnel round-trip — an
upper bound on on-prem latency; the per-batch scaling isolates the
chip-side component).  Compared against the native C++ serial runtime's
~11 ms/solve (scripts/probe_native_*.py records) to produce the README
deployment decision rule.

Record: bench_records name=mpc_latency.
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
from trajectory_optimization_matrix_lie_groups_tpu.solvers.df_mixed import MixedDFPipelineSolver
from trajectory_optimization_matrix_lie_groups_tpu.solvers.df_pipeline import split_pytree, join_us
from trajectory_optimization_matrix_lie_groups_tpu.utils.records import record
import bench

DTYPE = jnp.float32
model, params, _, _, q_ref, xi_ref = bench.build_problem(DTYPE)
N = q_ref.shape[0] - 1
prob = bench.load_benchmark_pickle(bench.PKL)["prob"]
dt_static = float(prob["dt"])
params64 = bench.build_problem_np64(prob, N)
sp = split_pytree(params64)
q0_anchor = jnp.asarray(np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_q0.npy")), DTYPE)
xi0_anchor = jnp.asarray(np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_xi0.npy")), DTYPE)
us_golden = np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_us.npy"))
dp, cp = params["dyn"], params["cost"]

BATCHES = [int(b) for b in os.environ.get(
    "BATCHES", "1,64,256,1024,8192").split(",")]
REPS = int(os.environ.get("REPS", "5"))

rows = []
for B in BATCHES:
    S = 8 if B >= 1024 else 1
    tile = min(1024, B) if S == 8 else min(256, B)
    chunk = 2 if S == 8 else 4
    f32 = PallasPipelineSolver(N=N, iterations=bench.ITERS, dt=dt_static,
                               batch_tile=tile, stage_chunk=chunk,
                               sublanes=S)
    mx = MixedDFPipelineSolver(N=N, dt=dt_static, f32_iterations=7,
                               df_iterations=2, batch_tile=tile,
                               stage_chunk=chunk, sublanes=S)

    def mk(seed):
        dq = 0.05 * jax.random.normal(jax.random.PRNGKey(seed), (B, 6), DTYPE)
        return jax.device_put(
            SE3.normalize(q0_anchor[None] @ SE3.exp(dq)).at[0].set(q0_anchor))

    xi0s = jax.device_put(jnp.broadcast_to(xi0_anchor, (B, 6)).astype(DTYPE))
    us0 = jax.device_put(jnp.zeros((B, N, 6), DTYPE))
    bs = [mk(s) for s in range(REPS + 2)]
    jax.block_until_ready((bs, xi0s, us0))
    row = {"B": B, "sublanes": S, "tile": tile, "chunk": chunk}
    try:
        out = f32.solve(dp, cp, bs[0], xi0s, us0)
        _ = np.asarray(out.us[:, 0, :])
        out = f32.solve(dp, cp, bs[1], xi0s, us0)   # priming rep
        _ = np.asarray(out.us[:, 0, :])
        ts = []
        for r in range(2, REPS + 2):
            t0 = time.perf_counter()
            out = f32.solve(dp, cp, bs[r], xi0s, us0)
            _ = np.asarray(out.us[:, 0, :])
            ts.append(time.perf_counter() - t0)
        err = float(np.max(np.abs(np.asarray(out.us[0], np.float64)
                                  - us_golden)))
        row.update(f32_latency_ms=round(min(ts) * 1e3, 2),
                   f32_latency_ms_median=round(float(np.median(ts)) * 1e3, 2),
                   f32_err=err)
    except Exception as e:  # noqa: BLE001
        row.update(f32_error=repr(e)[:200])
    try:
        prev = jax.config.jax_enable_x64
        jax.config.update("jax_enable_x64", False)
        lane = mx._f32_jit(sp, bs[0], xi0s, us0)
        out = mx._df_jit(sp, *lane)
        _ = np.asarray(out.us_hi[:, 0, :])
        lane = mx._f32_jit(sp, bs[1], xi0s, us0)
        out = mx._df_jit(sp, *lane)
        _ = np.asarray(out.us_hi[:, 0, :])
        ts = []
        for r in range(2, REPS + 2):
            t0 = time.perf_counter()
            lane = mx._f32_jit(sp, bs[r], xi0s, us0)
            out = mx._df_jit(sp, *lane)
            _ = np.asarray(out.us_hi[:, 0, :])
            ts.append(time.perf_counter() - t0)
        jax.config.update("jax_enable_x64", prev)
        err = float(np.max(np.abs(join_us(out)[0] - us_golden)))
        row.update(mixed_latency_ms=round(min(ts) * 1e3, 2),
                   mixed_latency_ms_median=round(
                       float(np.median(ts)) * 1e3, 2),
                   mixed_err=err)
    except Exception as e:  # noqa: BLE001
        jax.config.update("jax_enable_x64", prev)
        row.update(mixed_error=repr(e)[:200])
    rows.append(row)
    print(json.dumps(row), flush=True)

result = {"backend": jax.default_backend(), "N": N,
          "f32_iters": bench.ITERS, "mixed": "f32x7+df2",
          "native_cpu_ms_per_solve": 11.0, "rows": rows}
print(json.dumps(result))
record("mpc_latency", result)
