"""TPU probe: time split of the double-f32 solve (f32 phase vs DF phase).

Times `DFPipelineSolver._f32_jit` and `._df_jit` separately at the bench
config to locate where the gate-passing headline's budget goes — input
for deciding whether a DF-phase kernelization is worth the engineering.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/traopt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

import bench
from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3
from trajectory_optimization_matrix_lie_groups_tpu.solvers.df_pipeline import (
    DFPipelineSolver,
    split_pytree,
)

B = int(os.environ.get("B", "8192"))
DF_ITERS = int(os.environ.get("DF_ITERS", "2"))

prob = bench.load_benchmark_pickle(bench.PKL)["prob"]
params64 = bench.build_problem_np64(prob, bench.HORIZON)
q0_anchor = np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_q0.npy"))
xi0_anchor = np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_xi0.npy"))

dfp = DFPipelineSolver(N=bench.HORIZON, dt=float(prob["dt"]),
                       f32_iterations=bench.ITERS, df_iterations=DF_ITERS,
                       batch_tile=min(256, B),  # lane-safe tile (bench's 1024 is the packed tile)
                       stage_chunk=bench.STAGE_CHUNK)
sp = split_pytree(params64)

def mk(seed):
    dq = 0.05 * jax.random.normal(jax.random.PRNGKey(seed), (B, 6),
                                  jnp.float32)
    q = SE3.normalize(jnp.asarray(q0_anchor, jnp.float32)[None]
                      @ SE3.exp(dq))
    return jax.device_put(q)

xi0s = jax.device_put(jnp.broadcast_to(
    jnp.asarray(xi0_anchor, jnp.float32), (B, 6)))
us0 = jax.device_put(jnp.zeros((B, bench.HORIZON, 6), jnp.float32))
batches = [mk(s) for s in range(4)]
jax.block_until_ready((batches, xi0s, us0))

prev = jax.config.jax_enable_x64
jax.config.update("jax_enable_x64", False)
try:
    # warm-up both phases
    lane = dfp._f32_jit(sp, batches[0], xi0s, us0)
    out = dfp._df_jit(sp, *lane)
    jax.block_until_ready(out)
    t_f32 = t_df = np.inf
    for s in (1, 2):
        t0 = time.perf_counter()
        lane = dfp._f32_jit(sp, batches[s], xi0s, us0)
        # host materialization of a data-dependent slice: block_until_ready
        # resolves EARLY for pallas programs through the tunnel (CLAUDE.md)
        _ = np.asarray(lane[3][0, :, :8])
        t_f32 = min(t_f32, time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = dfp._df_jit(sp, *lane)
        _ = np.asarray(out.us_hi[:, 0, :])
        t_df = min(t_df, time.perf_counter() - t0)
finally:
    jax.config.update("jax_enable_x64", prev)

result = dict(backend=jax.default_backend(), B=B, df_iters=DF_ITERS,
              t_f32_phase_s=round(t_f32, 3), t_df_phase_s=round(t_df, 3),
              df_phase_frac=round(t_df / (t_f32 + t_df), 3),
              s_per_df_iteration=round(t_df / DF_ITERS, 3))
print(json.dumps(result))
from trajectory_optimization_matrix_lie_groups_tpu.utils.records import record
record("df_phase_split", result)
