"""TPU probe: locate the first-timed-rep 2x cliff in bench.py's rep loop.

BENCH_r03 rep_solves_per_s = [8991, 17320, 17261, 17349, 17178]: the first
timed rep after warm-up runs at half speed, every round.  Candidate causes:
(a) the warm-up's FULL-output readback (`np.asarray(out.us)` = 39 MB
through the tunnel) leaving the execution path in a slow state,
(b) a per-execution warm path in the remote runtime (first execution after
load at full batch), (c) chip clock ramp after idle.

Protocol: warm-up identical to bench.py, then ONE untimed priming rep with
a distinct batch (same readback slice as the timed reps), then 8 timed
reps with distinct batches.  If priming absorbs the cliff, bench.py gains
a priming rep; per-rep times tell the rest.
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
from trajectory_optimization_matrix_lie_groups_tpu.solvers.pipeline import (
    PallasPipelineSolver,
)
from trajectory_optimization_matrix_lie_groups_tpu.utils.records import record

B = int(os.environ.get("B", str(bench.BATCH)))
REPS = int(os.environ.get("REPS", "8"))
FULL_WARM_READBACK = os.environ.get("FULL_WARM_READBACK", "1") == "1"

model, params, _, _, q_ref, xi_ref = bench.build_problem(bench.DTYPE)
N = q_ref.shape[0] - 1
dt_static = float(bench.load_benchmark_pickle(bench.PKL)["prob"]["dt"])
solver = PallasPipelineSolver(N=N, iterations=bench.ITERS, dt=dt_static,
                              batch_tile=min(256, B),  # lane-safe tile (bench's 1024 is the packed tile)
                              stage_chunk=bench.STAGE_CHUNK)
q0_anchor = jnp.asarray(np.load(os.path.join(
    bench.GOLDEN_DIR, "bench_se3_n200_q0.npy")), bench.DTYPE)
xi0_anchor = jnp.asarray(np.load(os.path.join(
    bench.GOLDEN_DIR, "bench_se3_n200_xi0.npy")), bench.DTYPE)
xi0s = jnp.broadcast_to(xi0_anchor, (B, 6)).astype(bench.DTYPE)
us0 = jnp.zeros((B, N, 6), dtype=bench.DTYPE)


def mk(seed):
    dq = 0.05 * jax.random.normal(jax.random.PRNGKey(seed), (B, 6),
                                  bench.DTYPE)
    return SE3.normalize(q0_anchor[None] @ SE3.exp(dq)).at[0].set(q0_anchor)


batches = [jax.device_put(mk(s)) for s in range(REPS + 2)]
jax.block_until_ready(batches)
dp, cp = params["dyn"], params["cost"]

# warm-up exactly as bench.py round-3 did it (full readback) or sliced
out = solver.solve(dp, cp, batches[0], xi0s, us0)
t0 = time.perf_counter()
if FULL_WARM_READBACK:
    _ = np.asarray(out.us)
else:
    _ = np.asarray(out.us[:, 0, :])
t_warm_readback = time.perf_counter() - t0

# one untimed priming rep, identical in shape/readback to the timed reps
t0 = time.perf_counter()
out = solver.solve(dp, cp, batches[1], xi0s, us0)
_ = np.asarray(out.us[:, 0, :])
t_prime = time.perf_counter() - t0

rep_times = []
for r in range(2, REPS + 2):
    t0 = time.perf_counter()
    out = solver.solve(dp, cp, batches[r], xi0s, us0)
    _ = np.asarray(out.us[:, 0, :])
    rep_times.append(time.perf_counter() - t0)

result = dict(
    backend=jax.default_backend(), B=B,
    full_warm_readback=FULL_WARM_READBACK,
    t_warm_readback_s=round(t_warm_readback, 3),
    t_priming_rep_s=round(t_prime, 3),
    rep_times_s=[round(t, 4) for t in rep_times],
    rep_solves_per_s=[round(B / t, 1) for t in rep_times],
    best_solves_per_s=round(B / min(rep_times), 1),
)
print(json.dumps(result))
record("rep_cliff_probe", result)
