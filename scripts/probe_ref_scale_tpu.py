"""TPU record: the reference's FLAGSHIP N=955 SE(3) tracking problem.

Round-3 VERDICT item 2: every committed TPU record was N<=249; the
reference's headline benchmark (`benchmark_SE3_tracking.py:49-60`,
path_dense_random_columns_4obj.npy) is N=955 with a large initial offset
(90-degree attitude error).  This probe solves THAT problem — lane 0
anchors the pickle's own x0 and is gated against the pickle's converged
MS solution (`ms_se3.us`) — on the f32 Pallas pipeline + mixed-precision
DF polish, at a batch of perturbed initial conditions.

CPU feasibility (this round): the fixed-budget mu=0 engine converges from
the pickle x0 in 24 iterations to 9e-11 (f64), matching the reference's
own 24-entry J_hist.  Config: f32_iterations=24, df_iterations=2.

Env: B (default 1024), CHUNK (default 5; 955 = 5 * 191), F32_ITERS,
DF_ITERS.  Record: bench_records name=ref_scale_n955.
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
    join_us,
    split_pytree,
)
from trajectory_optimization_matrix_lie_groups_tpu.utils.records import record

B = int(os.environ.get("B", "1024"))
# 955 = 5 * 191: the only usable chunks are 1 and 5; packed (sublanes=8)
# tile-1024 blocks only fit VMEM at chunk=1
SUBLANES = int(os.environ.get("SUBLANES", "8" if B >= 1024 else "1"))
CHUNK = int(os.environ.get("CHUNK", "1" if SUBLANES == 8 else "5"))
F32_ITERS = int(os.environ.get("F32_ITERS", "24"))
DF_ITERS = int(os.environ.get("DF_ITERS", "2"))

data = bench.load_benchmark_pickle(bench.PKL)
prob = data["prob"]
N = np.asarray(prob["q_ref"]).shape[0] - 1  # 955: the full flagship horizon
us_ref = np.asarray(data["ms_se3"]["us"], np.float64)  # converged reference
params64 = bench.build_problem_np64(prob, N)

q0_pkl = jnp.asarray(np.asarray(prob["x0"][0]), jnp.float32)
xi0_pkl = jnp.asarray(np.asarray(prob["x0"][1]).reshape(6), jnp.float32)

TILE = min(1024, B) if SUBLANES == 8 else min(256, B)
mx = MixedDFPipelineSolver(N=N, dt=float(prob["dt"]),
                           f32_iterations=F32_ITERS, df_iterations=DF_ITERS,
                           batch_tile=TILE,
                           stage_chunk=CHUNK, sublanes=SUBLANES)
sp = split_pytree(params64)


def mk(seed):
    dq = 0.05 * jax.random.normal(jax.random.PRNGKey(seed), (B, 6),
                                  jnp.float32)
    q = SE3.normalize(q0_pkl[None] @ SE3.exp(dq)).at[0].set(q0_pkl)
    return jax.device_put(q)


xi0s = jax.device_put(jnp.broadcast_to(xi0_pkl, (B, 6)))
us0 = jax.device_put(jnp.zeros((B, N, 6), jnp.float32))
batches = [mk(s) for s in range(4)]
jax.block_until_ready((batches, xi0s, us0))

prev = jax.config.jax_enable_x64
jax.config.update("jax_enable_x64", False)
try:
    t0 = time.perf_counter()
    lane = mx._f32_jit(sp, batches[0], xi0s, us0)
    out = mx._df_jit(sp, *lane)
    _ = np.asarray(out.us_hi[:, 0, :])
    t_compile = time.perf_counter() - t0
    # priming rep (rep-cliff), then best-of-2 timed with distinct batches
    lane = mx._f32_jit(sp, batches[1], xi0s, us0)
    out = mx._df_jit(sp, *lane)
    _ = np.asarray(out.us_hi[:, 0, :])
    t_best = np.inf
    for s2 in (2, 3):
        t0 = time.perf_counter()
        lane = mx._f32_jit(sp, batches[s2], xi0s, us0)
        out = mx._df_jit(sp, *lane)
        _ = np.asarray(out.us_hi[:, 0, :])
        t_best = min(t_best, time.perf_counter() - t0)
finally:
    jax.config.update("jax_enable_x64", prev)

us = join_us(out)
err = float(np.max(np.abs(us[0] - us_ref)))
result = dict(
    backend=jax.default_backend(), N=N, B=B, chunk=CHUNK,
    sublanes=SUBLANES, tile=TILE,
    f32_iters=F32_ITERS, df_iters=DF_ITERS,
    t_compile_s=round(t_compile, 1),
    t_solve_best_s=round(t_best, 3),
    solves_per_s=round(B / t_best, 1),
    lane0_us_max_err_vs_ref=err,
    gate_1e4_passed=bool(err <= 1e-4),
    grad_norm_p50=float(np.percentile(np.asarray(out.grad_norm), 50)),
    grad_norm_p95=float(np.percentile(np.asarray(out.grad_norm), 95)),
    grad_norm_max=float(np.asarray(out.grad_norm).max()),
)
print(json.dumps(result))
record("ref_scale_n955", result)
