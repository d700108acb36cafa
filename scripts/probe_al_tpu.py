"""TPU probe: constrained-solve throughput on the fused pipeline.

ALPipelineSolver at bench-like scale (N=200, f32) vs the unconstrained
pipeline — measures the cost of the AL terms + outer loop on chip.
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

import bench
from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3
from trajectory_optimization_matrix_lie_groups_tpu.solvers.al_pipeline import (
    ALPipelineSolver,
)
from trajectory_optimization_matrix_lie_groups_tpu.solvers.pipeline import (
    PallasPipelineSolver,
)

H = 20 if SMALL else bench.HORIZON
B = 8 if SMALL else 4096
ITERS = 4 if SMALL else bench.ITERS
TILE = None if SMALL else 256
N_AL = int(os.environ.get("N_AL", "10"))  # bench-scale problem needs ~10 outers to 1e-2 (probe_al_bench_scale); on-chip at B=4096 10 outers converge 92% of lanes — override via N_AL env

model, params, _, _, q_ref, xi_ref = bench.build_problem(jnp.float32, horizon=H)
dp, cp = params["dyn"], params["cost"]
q0_anchor = jnp.asarray(
    np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_q0.npy")), jnp.float32)
xi0_anchor = jnp.asarray(
    np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_xi0.npy")), jnp.float32)

def make_batch(seed):
    # distinct inputs per timed call: identical repeated requests can be
    # served from the remote tunnel's cache (CLAUDE.md timing ground rules)
    dq = 0.05 * jax.random.normal(jax.random.PRNGKey(seed), (B, 6),
                                  jnp.float32)
    return SE3.normalize(q0_anchor[None] @ SE3.exp(dq))


q0s_batches = [make_batch(s) for s in range(4)]
xi0s = jnp.broadcast_to(xi0_anchor, (B, 6)).astype(jnp.float32)
us0 = jnp.zeros((B, H, 6), jnp.float32)

interp = jax.default_backend() != "tpu"
pipe = PallasPipelineSolver(N=H, iterations=ITERS, dt=float(dp.dt),
                            interpret=interp, batch_tile=TILE,
                            stage_chunk=1 if SMALL else bench.STAGE_CHUNK)
al = ALPipelineSolver(pipe, lb=np.full(6, -100.0), ub=np.full(6, 100.0))

# warm-up (compile both traced shapes)
res = al.solve(dp, cp, q0s_batches[0], xi0s, us0, n_al_iters=N_AL)
_ = np.asarray(res.us)
t0 = time.perf_counter()
res = al.solve(dp, cp, q0s_batches[1], xi0s, us0, n_al_iters=N_AL)
_ = np.asarray(res.us[:, 0, :])
t_al = time.perf_counter() - t0

out = pipe.solve(dp, cp, q0s_batches[2], xi0s, us0)
_ = np.asarray(out.us)
t0 = time.perf_counter()
out = pipe.solve(dp, cp, q0s_batches[3], xi0s, us0)
_ = np.asarray(out.us[:, 0, :])
t_unc = time.perf_counter() - t0

result = dict(
    B=B, H=H, iters=ITERS, n_al=N_AL,
    constrained_solves_per_s=round(B / t_al, 1),
    unconstrained_solves_per_s=round(B / t_unc, 1),
    al_outers_used=res.outer_iterations,
    lanes_converged=int((np.asarray(res.max_violation) < 1e-2).sum()),
    u_range=[round(float(res.us.min()), 2), round(float(res.us.max()), 2)],
    backend=jax.default_backend(),
)
print(json.dumps(result))
from trajectory_optimization_matrix_lie_groups_tpu.utils.records import record
record("al_pipeline", result)
