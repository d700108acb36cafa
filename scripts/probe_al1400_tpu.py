"""TPU record: the reference's N=1400 AL-constrained SE(3) problem.

Round-3 VERDICT item 2b: solve `main_SE3ddp_tracking_exact_al_ms.py`'s
N=1400 workload (tasks/al_bench.build_al1400 — screw reference, R = 0,
input box +-10) on the constrained Pallas pipeline (ALPipelineSolver
around the f32 lane-layout kernels), lane 0 gated against the committed
f64 CPU golden (tasks/golden/al1400_us.npy, scripts/gen_al1400_golden.py;
the converged optimum is interior — us in [-0.93, 3.69] — so the AL
machinery must settle on the unconstrained optimum through the box
machinery, as the reference run does).

Env: B (512), ITERS (16), N_AL (3), CHUNK (4; 1400 = 4 * 350).
Record: bench_records name=ref_scale_al1400.
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
from trajectory_optimization_matrix_lie_groups_tpu.tasks.al_bench import (
    build_al1400,
)
from trajectory_optimization_matrix_lie_groups_tpu.utils.records import record

B = int(os.environ.get("B", "1024"))
ITERS = int(os.environ.get("ITERS", "16"))
N_AL = int(os.environ.get("N_AL", "3"))
CHUNK = int(os.environ.get("CHUNK", "4"))
H = 1400

params, lb, ub, q0, xi0, q_ref, xi_ref = build_al1400(jnp.float32, H)
dp, cp = params["dyn"], params["cost"]
us_ref = np.load(os.path.join(bench.GOLDEN_DIR, "al1400_us.npy"))

# sublane-packed layout where the batch can fill the lane axis (B >= 1024)
SUBLANES = int(os.environ.get("SUBLANES", "8" if B >= 1024 else "1"))
TILE = min(1024, B) if SUBLANES == 8 else min(256, B)
pipe = PallasPipelineSolver(N=H, iterations=ITERS, dt=float(dp.dt),
                            batch_tile=TILE, stage_chunk=CHUNK,
                            sublanes=SUBLANES)
al = ALPipelineSolver(pipe, lb=np.full(6, lb), ub=np.full(6, ub))


def mk(seed):
    dq = 0.05 * jax.random.normal(jax.random.PRNGKey(seed), (B, 6),
                                  jnp.float32)
    q = SE3.normalize(q0[None] @ SE3.exp(dq)).at[0].set(q0)
    return jax.device_put(q)


xi0s = jax.device_put(jnp.broadcast_to(xi0, (B, 6)))
us0 = jax.device_put(jnp.zeros((B, H, 6), jnp.float32))
batches = [mk(s) for s in range(4)]
jax.block_until_ready((batches, xi0s, us0))

t0 = time.perf_counter()
res = al.solve(dp, cp, batches[0], xi0s, us0, n_al_iters=N_AL)
_ = np.asarray(res.us[:, 0, :])
t_compile = time.perf_counter() - t0
# priming rep, then best-of-2 timed with distinct batches
res = al.solve(dp, cp, batches[1], xi0s, us0, n_al_iters=N_AL)
_ = np.asarray(res.us[:, 0, :])
t_best = np.inf
res_by_seed = {}
for s in (2, 3):
    t0 = time.perf_counter()
    res = al.solve(dp, cp, batches[s], xi0s, us0, n_al_iters=N_AL)
    _ = np.asarray(res.us[:, 0, :])
    t_best = min(t_best, time.perf_counter() - t0)
    res_by_seed[s] = res

mv = np.asarray(res.max_violation)
err = float(np.max(np.abs(np.asarray(res.us[0], np.float64) - us_ref)))
result = dict(
    backend=jax.default_backend(), N=H, B=B, chunk=CHUNK,
    sublanes=SUBLANES, tile=TILE,
    f32_iters=ITERS, n_al=N_AL,
    t_compile_s=round(t_compile, 1),
    t_solve_best_s=round(t_best, 3),
    solves_per_s=round(B / t_best, 1),
    lanes_converged_frac=round(float((mv < 1e-2).mean()), 4),
    lane0_us_max_err_vs_golden=err,
    u_range=[round(float(res.us.min()), 2), round(float(res.us.max()), 2)],
)

if os.environ.get("POLISH", "1") == "1":
    # The golden has 31 controls RAILED at +10 (an active box), so an
    # unconstrained polish diverges (measured: 94.5 max err, 2026-08-21
    # record) — instead polish the AUGMENTED Lagrangian at the converged
    # outer loop's fixed (lmbd, imu): its fixed point is the constrained
    # optimum to multiplier accuracy (solvers/df_mixed.py `al=` contract).
    from trajectory_optimization_matrix_lie_groups_tpu.solvers.al_pipeline import (
        al_polish,
    )
    from trajectory_optimization_matrix_lie_groups_tpu.solvers.df_mixed import (
        MixedDFPipelineSolver,
    )
    from trajectory_optimization_matrix_lie_groups_tpu.tasks.al_bench import (
        build_al1400_np64,
    )

    # FULL f32 budget: the polish re-closes the MS defects itself
    # (al_polish docstring; a short budget stalls at grad ~4e-3)
    PF32 = int(os.environ.get("POLISH_F32", str(ITERS)))
    PDF = int(os.environ.get("POLISH_DF", "2"))
    N_POL = int(os.environ.get("POLISH_OUTERS", "2"))
    mx = MixedDFPipelineSolver(N=H, dt=float(dp.dt), f32_iterations=PF32,
                               df_iterations=PDF,
                               batch_tile=TILE, stage_chunk=CHUNK,
                               sublanes=SUBLANES)
    params64 = build_al1400_np64(H)
    # compile/warm on batches[2]'s result, time on batches[3]'s — identical
    # repeated tunnel requests may be cache-served (CLAUDE.md), so the
    # timed rep must see distinct inputs from the warm rep
    t0 = time.perf_counter()
    us_pol, out, _, _ = al_polish(mx, params64, lb, ub, res_by_seed[2],
                                  batches[2], xi0s, n_outers=N_POL)
    t_pol_compile = time.perf_counter() - t0
    tm = {}
    t0 = time.perf_counter()
    us_pol, out, _, _ = al_polish(mx, params64, lb, ub, res_by_seed[3],
                                  batches[3], xi0s, n_outers=N_POL,
                                  timings=tm)
    t_pol = time.perf_counter() - t0
    err_pol = float(np.max(np.abs(us_pol[0] - us_ref)))
    result.update(
        polish_f32_iters=PF32, polish_df_iters=PDF, polish_al=True,
        polish_outers=N_POL,
        t_polish_s=round(t_pol, 3),
        t_polish_split={k: [round(v, 3) for v in vs]
                        for k, vs in tm.items()},
        t_polish_compile_s=round(t_pol_compile, 1),
        solves_per_s_with_polish=round(B / (t_best + t_pol), 1),
        lane0_us_max_err_polished=err_pol,
        gate_1e4_passed=bool(err_pol <= 1e-4),
        u_abs_max_polished=round(float(np.abs(us_pol).max()), 3),
    )

    # device-dual polish (al_polish_device): no per-outer host readback —
    # the host variant is tunnel/host-bound (see t_polish_split).  Timed
    # best-of-2 with distinct batches, first-control readback barrier
    # (bench.py methodology); gate on lane 0 via a small slice.
    from trajectory_optimization_matrix_lie_groups_tpu.solvers.al_pipeline import (
        al_polish_device,
    )

    outd, _, _ = al_polish_device(mx, params64, lb, ub, res_by_seed[2],
                                  batches[2], xi0s, n_outers=N_POL)
    _ = np.asarray(outd.us_hi[:, 0, :])
    t_dev = np.inf
    for s in (3, 2):
        t0 = time.perf_counter()
        outd, _, _ = al_polish_device(mx, params64, lb, ub, res_by_seed[s],
                                      batches[s], xi0s, n_outers=N_POL)
        _ = np.asarray(outd.us_hi[:, 0, :])
        t_dev = min(t_dev, time.perf_counter() - t0)
    us0_dev = (np.asarray(outd.us_hi[0], np.float64)
               + np.asarray(outd.us_lo[0], np.float64))
    err_dev = float(np.max(np.abs(us0_dev - us_ref)))
    result.update(
        t_polish_device_s=round(t_dev, 3),
        solves_per_s_with_device_polish=round(B / (t_best + t_dev), 1),
        lane0_us_max_err_device_polish=err_dev,
        gate_1e4_passed_device=bool(err_dev <= 1e-4),
    )

print(json.dumps(result))
record("ref_scale_al1400", result)
