"""TPU probe: SO(3)-family lane-layout pipeline (free attitude + pendulum).

Round-2 VERDICT item 4 evidence: on-chip solves/s for both SO(3) dynamics
families on the 2-kernel fused pipeline, with lane-0 controls compared
against the reference pickles' converged solutions (f32 expectation:
~1e-3-grade agreement — the f32 noise floor; the f64 parity gate is held
by the CPU engines, tests/test_parity_all.py).

Run small on CPU with PROBE_SMALL=1 (interpret mode) to smoke-test.
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

from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SO3
from trajectory_optimization_matrix_lie_groups_tpu.solvers.pipeline_so3 import (
    SO3PipelineSolver,
)
from trajectory_optimization_matrix_lie_groups_tpu.tasks.parity import (
    build_benchmark,
)

B = 8 if SMALL else 8192
SUBLANES = int(os.environ.get("SUBLANES", "1" if SMALL else "8"))
TILE = None if SMALL else (1024 if SUBLANES == 8 else 256)
ITERS = 4 if SMALL else 30  # pendulum swing-up converges in ~30 fixed-budget iters
interp = jax.default_backend() != "tpu"

results = {}
for name, pendulum in (("so3_tracking", False), ("pendulum_swingup", True)):
    data, solver, params, x0, us0, sol_key = build_benchmark(name, True)
    to32 = lambda t: jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, t)
    params32 = to32(params)
    cp, dp = params32["cost"], params32["dyn"]
    N = cp.q_ref.shape[0] - 1
    q0, xi0 = x0

    def make_batch(seed):
        dq = 0.02 * jax.random.normal(jax.random.PRNGKey(seed), (B, 3),
                                      jnp.float32)
        q0s = SO3.normalize(jnp.asarray(q0, jnp.float32)[None] @ SO3.exp(dq))
        return q0s.at[0].set(jnp.asarray(q0, jnp.float32))  # lane-0 anchor

    batches = [make_batch(s) for s in range(3)]
    xi0s = jnp.broadcast_to(jnp.asarray(xi0, jnp.float32), (B, 3))
    us0 = jnp.zeros((B, N, 3), jnp.float32)

    # chunk=1: round-3 probe showed chunking HURTS the SO(3)-family
    # kernels (9.5k vs 10.2k so3 / 20.2k vs 21.0k pendulum at chunk 3/4
    # — smaller per-stage state, grid overhead already amortized)
    pipe = SO3PipelineSolver(N=N, iterations=ITERS, dt=float(dp.dt),
                             pendulum=pendulum, interpret=interp,
                             batch_tile=TILE, sublanes=SUBLANES)
    out = pipe.solve(dp, cp, batches[0], xi0s, us0)
    _ = np.asarray(out.us)  # warm-up + compile
    out = pipe.solve(dp, cp, batches[2], xi0s, us0)
    _ = np.asarray(out.us[:, 0, :])  # priming rep (rep-cliff)
    t0 = time.perf_counter()
    out = pipe.solve(dp, cp, batches[1], xi0s, us0)
    _ = np.asarray(out.us[:, 0, :])  # first-control readback barrier
    dt_s = time.perf_counter() - t0

    us_ref = np.asarray(data[sol_key]["us"])
    err = float(np.max(np.abs(np.asarray(out.us[0], np.float64) - us_ref)))
    results[name] = dict(
        N=N, B=B, iters=ITERS, sublanes=SUBLANES,
        solves_per_s=round(B / dt_s, 1),
        lane0_us_max_err_vs_ref=err,
    )

result = dict(backend=jax.default_backend(), **results)
print(json.dumps(result))
from trajectory_optimization_matrix_lie_groups_tpu.utils.records import record
record("so3_pendulum_pipeline", result)
