"""Drone-family (nu=4, gravity) mixed-precision DF polish.

CPU mode (default off-TPU): short-horizon smoke of the gravity + rotor-
projection (Pu 6x4) path through `MixedDFPipelineSolver` vs the f64
oracle — the bench-config mixed kernels only ever ran gravity=False, so
this gates the `glow`/Pu branches before burning TPU compile time.

TPU mode: the reference drone-racing workload
(benchmark_drone_racing_tracking.py:47-58) at full N=150, lane 0
anchored at the pickle's x0 and gated against the pickle's converged MS
controls — closes the drone accuracy gap (f32 pipeline record
name=drone_pipeline_tpu stops at 4.0e-3; the gate everywhere else is
1e-4).  Record: bench_records name=drone_mixed_tpu.

Env: B (default 2048), F32_ITERS (12), DF_ITERS (2), H (CPU cut, 30).
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

from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3
from trajectory_optimization_matrix_lie_groups_tpu.solvers.df_mixed import (
    MixedDFPipelineSolver,
)
from trajectory_optimization_matrix_lie_groups_tpu.solvers.df_pipeline import (
    join_us,
    split_pytree,
)
from trajectory_optimization_matrix_lie_groups_tpu.utils.records import record

FORCE_CPU = os.environ.get("CPU") == "1"
if FORCE_CPU:
    jax.config.update("jax_platforms", "cpu")

ON_TPU = not FORCE_CPU and jax.default_backend() == "tpu"

if not ON_TPU:
    jax.config.update("jax_enable_x64", True)

from trajectory_optimization_matrix_lie_groups_tpu.tasks.parity import (
    build_benchmark,
    cut_reference,
)

data, solver, params, x0, us0_full, _ = build_benchmark("drone_racing", True)
dp = params["dyn"]
us_ref_full = np.asarray(data["ms_se3"]["us"], np.float64)
NU = us_ref_full.shape[-1]

if not ON_TPU:
    # ---- CPU smoke: H-cut problem vs f64 oracle ---------------------------
    from trajectory_optimization_matrix_lie_groups_tpu.solvers.batched import (
        FastBatchSolver,
    )

    H = int(os.environ.get("H", "30"))
    B = int(os.environ.get("B", "2"))
    F32_ITERS = int(os.environ.get("F32_ITERS", "10"))
    DF_ITERS = int(os.environ.get("DF_ITERS", "2"))
    params = cut_reference(params, H)
    cp = params["cost"]

    dq = 0.03 * jax.random.normal(jax.random.PRNGKey(0), (B, 6),
                                  dtype=jnp.float64)
    q0s = SE3.normalize(cp.q_ref[0][None] @ SE3.exp(dq))
    xi0s = jnp.broadcast_to(cp.xi_ref[0], (B, 6))
    us0s = jnp.zeros((B, H, NU), jnp.float64)

    fast = FastBatchSolver(solver.model, N=H, iterations=F32_ITERS + DF_ITERS,
                           use_pallas=False)
    ref = fast.solve(params, q0s, xi0s, us0s, cp.q_ref, cp.xi_ref)
    us_oracle = np.asarray(ref.us, np.float64)

    np_params = jax.tree.map(np.asarray, params)
    mx = MixedDFPipelineSolver(
        N=H, dt=float(dp.dt), f32_iterations=F32_ITERS,
        df_iterations=DF_ITERS, gravity=True,
        exact_gravity_jacobian=bool(dp.exact_gravity_jacobian),
        interpret=True)
    t0 = time.perf_counter()
    out = mx.solve(np_params, q0s, xi0s, us0s)
    wall = time.perf_counter() - t0
    err = float(np.max(np.abs(join_us(out) - us_oracle)))
    print(json.dumps(dict(mode="cpu_smoke", H=H, B=B, wall_s=round(wall, 1),
                          us_max_err_vs_oracle=err, passed=bool(err < 1e-4))))
    sys.exit(0 if err < 1e-4 else 1)

# ---- TPU: the full N=150 drone-racing workload ---------------------------
B = int(os.environ.get("B", "2048"))
F32_ITERS = int(os.environ.get("F32_ITERS", "12"))
DF_ITERS = int(os.environ.get("DF_ITERS", "2"))
cp = params["cost"]
N = cp.q_ref.shape[0] - 1
chunk = next(c for c in (4, 2, 1) if N % c == 0)

params64 = jax.tree.map(lambda x: np.asarray(x), params)
sp = split_pytree(params64)
q0_pkl = jnp.asarray(np.asarray(data["prob"]["x0"][0]), jnp.float32)
xi0_pkl = jnp.asarray(
    np.asarray(data["prob"]["x0"][1]).reshape(6), jnp.float32)

SUBLANES = int(os.environ.get("SUBLANES", "8"))
tile = min(1024, B) if SUBLANES == 8 else min(256, B)
mx = MixedDFPipelineSolver(
    N=N, dt=float(dp.dt), f32_iterations=F32_ITERS, df_iterations=DF_ITERS,
    batch_tile=tile, stage_chunk=chunk, gravity=True,
    exact_gravity_jacobian=bool(dp.exact_gravity_jacobian),
    sublanes=SUBLANES)


def mk(seed):
    dq = 0.03 * jax.random.normal(jax.random.PRNGKey(seed), (B, 6),
                                  jnp.float32)
    q = SE3.normalize(q0_pkl[None] @ SE3.exp(dq)).at[0].set(q0_pkl)
    return jax.device_put(q)


xi0s = jax.device_put(jnp.broadcast_to(xi0_pkl, (B, 6)))
us0 = jax.device_put(jnp.zeros((B, N, NU), jnp.float32))
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
    # priming rep (rep-cliff), then best-of-2 with distinct batches
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
err = float(np.max(np.abs(us[0] - us_ref_full)))
result = dict(
    backend=jax.default_backend(), N=N, B=B, chunk=chunk, nu=NU,
    sublanes=SUBLANES, tile=tile,
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
record("drone_mixed_tpu", result)
