"""TPU probe: per-kernel timing split of the pipeline iteration.

Times each of the three Pallas kernels (linearize / backward / rollout) in
isolation (jitted, looped ITERS times on-device to amortize dispatch), plus
the full solve, at the bench config.  Identifies where the ~21 ms batch
iteration goes before attempting kernel fusion.
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/traopt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp
from jax import lax
from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3
from trajectory_optimization_matrix_lie_groups_tpu.solvers.pipeline import PallasPipelineSolver
import bench

DTYPE = jnp.float32
# lane-layout probe: lane-safe tile/batch (bench's constants are the packed config)
B, TILE, CHUNK, ITERS = 8192, 256, 2, bench.ITERS
model, params, _, _, q_ref, xi_ref = bench.build_problem(DTYPE)
N = q_ref.shape[0] - 1
dt_static = float(bench.load_benchmark_pickle(bench.PKL)["prob"]["dt"])
q0_anchor = jnp.asarray(np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_q0.npy")), DTYPE)
xi0_anchor = jnp.asarray(np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_xi0.npy")), DTYPE)
dp, cp = params["dyn"], params["cost"]

solver = PallasPipelineSolver(N=N, iterations=ITERS, dt=dt_static,
                              batch_tile=TILE, stage_chunk=CHUNK)

dq = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (B, 6), dtype=DTYPE)
q0s = SE3.normalize(q0_anchor[None] @ SE3.exp(dq))
xi0s = jnp.broadcast_to(xi0_anchor, (B, 6)).astype(DTYPE)
us0 = jnp.zeros((B, N, 6), dtype=DTYPE)

prep = jax.jit(lambda q0s, xi0s, us0: solver._prepare(dp, cp, q0s, xi0s, us0))
qR, qp_, xi, us, refs, consts = prep(q0s, xi0s, us0)
jax.block_until_ready((qR, qp_, xi, us))

lu = 2.0 * jnp.einsum("ij,njb->nib", cp.R.astype(DTYPE), us)
_ref = lambda x: jnp.moveaxis(
    jnp.broadcast_to(x[:, None], (x.shape[0], B) + x.shape[1:]), 1, -1)
_lanes = lambda M: jnp.broadcast_to(
    jnp.asarray(M, DTYPE)[..., None], jnp.asarray(M).shape + (B,))
term = (qR[-1], qp_[-1], xi[-1],
        _ref(cp.q_ref_inv[-1:, :3, :3])[0], _ref(cp.q_ref_inv[-1:, :3, 3])[0],
        _ref(cp.Ad_ref[-1:])[0], _ref(cp.xi_ref[-1:])[0],
        _lanes(cp.P1), _lanes(cp.P2))


@jax.jit
def run_linearize(qR, qp_, xi, us):
    def body(_, c):
        lin = solver._linearize_lane(qR, qp_, xi, us, refs, consts)
        return c + lin["d"][0, 0, 0]
    return lax.fori_loop(0, ITERS, body, jnp.zeros((), DTYPE))


lin0 = jax.jit(lambda qR, qp_, xi, us: solver._linearize_lane(
    qR, qp_, xi, us, refs, consts))(qR, qp_, xi, us)
jax.block_until_ready(lin0)


@jax.jit
def run_backward(lin, lu):
    def body(_, c):
        k, K, gvec, lN = solver._backward_lane(lin, lu, term, consts)
        return c + k[0, 0, 0]
    return lax.fori_loop(0, ITERS, body, jnp.zeros((), DTYPE))


k0, K0, _, _ = jax.jit(lambda lin, lu: solver._backward_lane(
    lin, lu, term, consts))(lin0, lu)
jax.block_until_ready((k0, K0))


@jax.jit
def run_rollout(qR, qp_, xi, us, k, K, lin):
    def body(_, c):
        oR, op, oxi, ou = solver._rollout_lane(qR, qp_, xi, us, k, K, lin,
                                               consts)
        return c + ou[0, 0, 0]
    return lax.fori_loop(0, ITERS, body, jnp.zeros((), DTYPE))


def timeit(name, fn, *args):
    out = fn(*args)
    _ = np.asarray(out)  # warm-up/compile + completion barrier
    best = np.inf
    for _rep in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"phase": name,
                      "ms_per_iter": round(best / ITERS * 1e3, 3)}),
          flush=True)
    return best


timeit("linearize", run_linearize, qR, qp_, xi, us)
timeit("backward", run_backward, lin0, lu)
timeit("rollout", run_rollout, qR, qp_, xi, us, k0, K0, lin0)

out = solver.solve(dp, cp, q0s, xi0s, us0)
_ = np.asarray(out.us)
best = np.inf
for _rep in range(3):
    t0 = time.perf_counter()
    out = solver.solve(dp, cp, q0s, xi0s, us0)
    _ = np.asarray(out.us)
    best = min(best, time.perf_counter() - t0)
print(json.dumps({"phase": "full_solve",
                  "ms_per_iter": round(best / ITERS * 1e3, 3)}), flush=True)
