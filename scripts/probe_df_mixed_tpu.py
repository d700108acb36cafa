"""TPU probe: mixed-precision DF polish vs full-DF at the bench config.

Times the f32 phase and the polish phase separately for
`MixedDFPipelineSolver` (DF residuals + f32 preconditioner,
solvers/df_mixed.py) at the headline config (N=200, B=8192, f32x12+df2),
and checks lane-0 accuracy against the committed f64 golden.  Compare
with bench_records name=df_phase_split (full-DF: 2.32 s DF phase at the
same config -> 31x an f32 iteration).

Env: B, DF_ITERS, FULL_DF=1 to probe the full-DF solver instead.
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
from trajectory_optimization_matrix_lie_groups_tpu.solvers.df_mixed import (
    MixedDFPipelineSolver,
)
from trajectory_optimization_matrix_lie_groups_tpu.solvers.df_pipeline import (
    DFPipelineSolver,
    join_us,
    split_pytree,
)
from trajectory_optimization_matrix_lie_groups_tpu.utils.records import record

B = int(os.environ.get("B", "8192"))
DF_ITERS = int(os.environ.get("DF_ITERS", "2"))
F32_ITERS = int(os.environ.get("F32_ITERS", str(bench.ITERS)))
FULL_DF = os.environ.get("FULL_DF") == "1"

prob = bench.load_benchmark_pickle(bench.PKL)["prob"]
params64 = bench.build_problem_np64(prob, bench.HORIZON)
q0_anchor = np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_q0.npy"))
xi0_anchor = np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_xi0.npy"))
us_golden = np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_us.npy"))

cls = DFPipelineSolver if FULL_DF else MixedDFPipelineSolver
kw = ({} if FULL_DF
      else dict(fx_mode=os.environ.get("FX_MODE", "df")))
SUBLANES = int(os.environ.get("SUBLANES", str(bench.SUBLANES)))
DF_TILE = os.environ.get("DF_TILE")
if DF_TILE:
    kw["df_batch_tile"] = int(DF_TILE)
dfp = cls(N=bench.HORIZON, dt=float(prob["dt"]),
          f32_iterations=F32_ITERS, df_iterations=DF_ITERS,
          batch_tile=min(bench.BATCH_TILE, B),
          stage_chunk=bench.STAGE_CHUNK, sublanes=SUBLANES, **kw)
sp = split_pytree(params64)


def mk(seed):
    dq = 0.05 * jax.random.normal(jax.random.PRNGKey(seed), (B, 6),
                                  jnp.float32)
    q = SE3.normalize(jnp.asarray(q0_anchor, jnp.float32)[None]
                      @ SE3.exp(dq)).at[0].set(
                          jnp.asarray(q0_anchor, jnp.float32))
    return jax.device_put(q)


xi0s = jax.device_put(jnp.broadcast_to(
    jnp.asarray(xi0_anchor, jnp.float32), (B, 6)))
us0 = jax.device_put(jnp.zeros((B, bench.HORIZON, 6), jnp.float32))
batches = [mk(s) for s in range(5)]
jax.block_until_ready((batches, xi0s, us0))

prev = jax.config.jax_enable_x64
jax.config.update("jax_enable_x64", False)
try:
    # warm-up both phases, then one untimed priming rep (rep-cliff), then
    # best-of-2 timed with distinct pre-staged batches
    t0 = time.perf_counter()
    lane = dfp._f32_jit(sp, batches[0], xi0s, us0)
    out = dfp._df_jit(sp, *lane)
    _ = np.asarray(out.us_hi[:, 0, :])
    t_compile = time.perf_counter() - t0
    lane = dfp._f32_jit(sp, batches[1], xi0s, us0)
    out = dfp._df_jit(sp, *lane)
    _ = np.asarray(out.us_hi[:, 0, :])
    t_f32 = t_df = t_total = np.inf
    for s in (2, 3):
        t0 = time.perf_counter()
        lane = dfp._f32_jit(sp, batches[s], xi0s, us0)
        _ = np.asarray(lane[3][0, :, :8])
        t1 = time.perf_counter()
        out = dfp._df_jit(sp, *lane)
        _ = np.asarray(out.us_hi[:, 0, :])
        t2 = time.perf_counter()
        t_f32 = min(t_f32, t1 - t0)
        t_df = min(t_df, t2 - t1)
    # end-to-end solve timing (the bench path: no mid-phase barrier)
    for s in (4, 2):
        t0 = time.perf_counter()
        lane = dfp._f32_jit(sp, batches[s], xi0s, us0)
        out = dfp._df_jit(sp, *lane)
        _ = np.asarray(out.us_hi[:, 0, :])
        t_total = min(t_total, time.perf_counter() - t0)
finally:
    jax.config.update("jax_enable_x64", prev)

us = join_us(out)
err = float(np.max(np.abs(us[0] - us_golden)))
f32_iter_s = t_f32 / F32_ITERS
result = dict(
    backend=jax.default_backend(), B=B, df_iters=DF_ITERS,
    f32_iters=F32_ITERS,
    solver=cls.__name__, sublanes=SUBLANES,
    fx_mode=getattr(dfp, "fx_mode", None),
    kernel_polish=getattr(dfp, "kernel_polish", None),
    t_compile_s=round(t_compile, 1),
    t_f32_phase_s=round(t_f32, 3), t_df_phase_s=round(t_df, 3),
    s_per_df_iteration=round(t_df / DF_ITERS, 3),
    df_over_f32_iter_ratio=round(t_df / DF_ITERS / f32_iter_s, 1),
    t_total_best_s=round(t_total, 3),
    solves_per_s=round(B / t_total, 1),
    us_max_err_vs_golden=err,
    grad_norm_max=float(np.asarray(out.grad_norm).max()),
)
print(json.dumps(result))
record("df_mixed_tpu" if not FULL_DF else "df_full_tpu_recheck", result)
