"""TPU probe: AL outer-loop warm start (round-2 VERDICT item 6b).

Cold mode (reference semantics): every outer restarts the inner from us0
with the full 12-iteration budget.  Warm mode: outers after the first
start from the previous outer's solution with a short inner budget.
Measures both at bench scale with distinct pre-staged batches and gates
warm on (a) 100% lane convergence and (b) control agreement with cold.
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
from trajectory_optimization_matrix_lie_groups_tpu.solvers.al_pipeline import (
    ALPipelineSolver,
)
from trajectory_optimization_matrix_lie_groups_tpu.solvers.pipeline import (
    PallasPipelineSolver,
)

B = int(os.environ.get("B", "4096"))
N_AL = int(os.environ.get("N_AL", "14"))
WARM_ITERS = int(os.environ.get("WARM_ITERS", "4"))

model, params, _, _, q_ref, xi_ref = bench.build_problem(jnp.float32)
N = q_ref.shape[0] - 1
dp, cp = params["dyn"], params["cost"]
dt_static = float(bench.load_benchmark_pickle(bench.PKL)["prob"]["dt"])
q0_anchor = jnp.asarray(np.load(os.path.join(
    bench.GOLDEN_DIR, "bench_se3_n200_q0.npy")), jnp.float32)
xi0_anchor = jnp.asarray(np.load(os.path.join(
    bench.GOLDEN_DIR, "bench_se3_n200_xi0.npy")), jnp.float32)

pipe = PallasPipelineSolver(N=N, iterations=bench.ITERS, dt=dt_static,
                            batch_tile=min(256, B),  # lane-safe tile (bench's 1024 is the packed tile)
                            stage_chunk=bench.STAGE_CHUNK)
al = ALPipelineSolver(pipe, lb=np.full(6, -100.0), ub=np.full(6, 100.0))

mk = lambda s: jax.device_put(SE3.normalize(q0_anchor[None] @ SE3.exp(
    0.05 * jax.random.normal(jax.random.PRNGKey(s), (B, 6), jnp.float32))))
xi0s = jax.device_put(jnp.broadcast_to(xi0_anchor, (B, 6)).astype(jnp.float32))
us0 = jax.device_put(jnp.zeros((B, N, 6), jnp.float32))
batches = [mk(s) for s in range(1, 5)]
jax.block_until_ready((batches, xi0s, us0))

out = {}
# cold (reference-budget) timing
res_c = al.solve(dp, cp, batches[0], xi0s, us0, n_al_iters=N_AL)
_ = np.asarray(res_c.us)  # warm-up/compile
t0 = time.perf_counter()
res_c = al.solve(dp, cp, batches[1], xi0s, us0, n_al_iters=N_AL)
_ = np.asarray(res_c.us[:, 0, :])
t_cold = time.perf_counter() - t0

# warm-start timing (same problem batch as the timed cold run for the
# accuracy comparison; a distinct batch for the timed run)
res_w0 = al.solve(dp, cp, batches[2], xi0s, us0, n_al_iters=N_AL,
                  warm_start=True, warm_iters=WARM_ITERS)
_ = np.asarray(res_w0.us)  # compile the warm pipe
t0 = time.perf_counter()
res_w = al.solve(dp, cp, batches[3], xi0s, us0, n_al_iters=N_AL,
                 warm_start=True, warm_iters=WARM_ITERS)
_ = np.asarray(res_w.us[:, 0, :])
t_warm = time.perf_counter() - t0

# accuracy: warm vs cold on the SAME batch (untimed)
res_wc = al.solve(dp, cp, batches[1], xi0s, us0, n_al_iters=N_AL,
                  warm_start=True, warm_iters=WARM_ITERS)
du = float(jnp.max(jnp.abs(res_wc.us - res_c.us)))

# the metric the reference's benchmark actually plots
# (benchmark_SE3_tracking.py:832-848, cost._err): per-stage pose tracking
# error ||Log(q_ref^-1 q)|| along the closed trajectory.  The warm mode's
# 200.0 max control difference (flat input directions, R ~ 1e-5) must NOT
# show up here — both modes must track equally well.
from trajectory_optimization_matrix_lie_groups_tpu.ops import se3 as se3o


def track_err(qs):  # (B, N+1, 4, 4) -> (B, N+1)
    qri = jax.vmap(se3o.inverse)(jnp.asarray(q_ref, jnp.float32))
    e = jax.vmap(lambda qrow: jax.vmap(
        lambda qi, qr: se3o.log(qr @ qi))(qrow, qri))(qs)
    return jnp.linalg.norm(e, axis=-1)


te_c = track_err(res_c.qs)
te_w = track_err(res_wc.qs)

mvc = np.asarray(res_c.max_violation)
mvw = np.asarray(res_w.max_violation)
result = dict(
    backend=jax.default_backend(), B=B, H=N, n_al=N_AL,
    warm_iters=WARM_ITERS,
    cold_solves_per_s=round(B / t_cold, 1),
    warm_solves_per_s=round(B / t_warm, 1),
    cold_outers=int(res_c.outer_iterations),
    warm_outers=int(res_w.outer_iterations),
    cold_lanes_converged_frac=round(float((mvc < 1e-2).mean()), 4),
    warm_lanes_converged_frac=round(float((mvw < 1e-2).mean()), 4),
    warm_vs_cold_us_max_diff=du,
    tracking_err_mean_cold=round(float(te_c.mean()), 6),
    tracking_err_mean_warm=round(float(te_w.mean()), 6),
    tracking_err_max_cold=round(float(te_c.max()), 6),
    tracking_err_max_warm=round(float(te_w.max()), 6),
    warm_vs_cold_tracking_mean_rel=round(
        float(te_w.mean() / max(float(te_c.mean()), 1e-12)), 4),
    u_range_warm=[round(float(res_w.us.min()), 2),
                  round(float(res_w.us.max()), 2)],
)
print(json.dumps(result))
from trajectory_optimization_matrix_lie_groups_tpu.utils.records import record
record("al_pipeline_warm", result)
