"""TPU probe: double-f32 polish pipeline at bench scale (VERDICT item 1).

Measures solvers/df_pipeline.DFPipelineSolver on the N=200 SE(3) tracking
benchmark: lane-0 controls vs the committed f64 golden
(tasks/golden/bench_se3_n200_us.npy) and solves/s at batch.  Target:
us_max_err <= 1e-4 at >= 500 solves/s (the round-1 numbers were 17.2k
solves/s at 1.1e-3 f32-only, or 47 solves/s at 5.9e-5 via the XLA-f64
polish).

Run small on CPU with PROBE_SMALL=1 (interpret mode) to smoke-test.
Batch via env B (default 1024), DF iterations via DF_ITERS (default 2).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/traopt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

SMALL = os.environ.get("PROBE_SMALL") == "1"
if SMALL:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import bench
from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3
from trajectory_optimization_matrix_lie_groups_tpu.solvers.df_pipeline import (
    DFPipelineSolver,
    join_us,
)

B = 4 if SMALL else int(os.environ.get("B", "1024"))
H = 8 if SMALL else bench.HORIZON
F32_ITERS = 2 if SMALL else bench.ITERS
DF_ITERS = 1 if SMALL else int(os.environ.get("DF_ITERS", "2"))
TILE = None if SMALL else min(256, B)

# f64 problem data built HOST-SIDE in numpy: the DF split must see full
# precision, and the device cannot hold f64 without x64
data = bench.load_benchmark_pickle(bench.PKL)
prob = data["prob"]
params64 = bench.build_problem_np64(prob, H)

q0_anchor = np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_q0.npy"))
xi0_anchor = np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_xi0.npy"))
us_golden = np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_us.npy"))
if SMALL:
    # derive SMALL-mode anchors from the f64 problem data itself
    q0_anchor = np.asarray(params64["cost"].q_ref[0])
    xi0_anchor = np.asarray(params64["cost"].xi_ref[0])


def make_batch(seed):
    dq = 0.05 * np.asarray(jax.random.normal(jax.random.PRNGKey(seed),
                                             (B, 6), jnp.float32), np.float64)
    q0s = np.array(SE3.normalize(
        jnp.asarray(q0_anchor, jnp.float32)[None]
        @ SE3.exp(jnp.asarray(dq, jnp.float32))))
    q0s[0] = q0_anchor  # lane-0 anchor
    return q0s


xi0s = np.broadcast_to(xi0_anchor, (B, 6))
us0 = np.zeros((B, H, 6), np.float32)

solver = DFPipelineSolver(
    N=H, dt=float(prob["dt"]), f32_iterations=F32_ITERS,
    df_iterations=DF_ITERS, batch_tile=TILE,
    stage_chunk=1 if SMALL else bench.STAGE_CHUNK,
    interpret=jax.default_backend() != "tpu")

# pre-stage inputs on device (us0 is ~20 MB at bench scale; its tunnel
# upload must stay out of the timed solve — solver.solve passes f32
# device arrays through untouched)
batches = [jax.device_put(jnp.asarray(make_batch(s), jnp.float32))
           for s in range(3)]
xi0s_d = jax.device_put(jnp.asarray(xi0s, jnp.float32))
us0_d = jax.device_put(jnp.asarray(us0, jnp.float32))
jax.block_until_ready((batches, xi0s_d, us0_d))
t0 = time.perf_counter()
out = solver.solve(params64, batches[0], xi0s_d, us0_d)
compile_s = time.perf_counter() - t0
t0 = time.perf_counter()
out = solver.solve(params64, batches[1], xi0s_d, us0_d)
_ = np.asarray(out.us_hi[:, 0, :])  # first-control readback barrier
dt_s = time.perf_counter() - t0

us0_full = join_us(out)[0]
if SMALL:
    err = float("nan")
else:
    err = float(np.max(np.abs(us0_full - us_golden)))

result = dict(
    backend=jax.default_backend(), B=B, H=H, f32_iters=F32_ITERS,
    df_iters=DF_ITERS, compile_s=round(compile_s, 1),
    solves_per_s=round(B / dt_s, 1),
    df_us_max_err_vs_golden=err,
)
print(json.dumps(result))
if not SMALL:
    from trajectory_optimization_matrix_lie_groups_tpu.utils.records import record
    record("df_pipeline", result)
