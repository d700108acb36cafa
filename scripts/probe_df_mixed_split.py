"""TPU probe: sub-phase split of ONE mixed-DF polish iteration.

Times backward_mx (reverse scan), rollout_mx (forward scan), and
linearize_tail_mx (lane-folded stage-parallel) as separate jits at the
bench config, to locate where the 0.7 s/iteration goes — scan overhead vs
lane-parallel XLA efficiency.  Input for deciding whether to kernelize
(Pallas) the mixed stage bodies or unroll the scans.
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
    _df,
    _map_df,
    _pair,
    split_pytree,
)
from trajectory_optimization_matrix_lie_groups_tpu.utils.records import record

B = int(os.environ.get("B", "8192"))

prob = bench.load_benchmark_pickle(bench.PKL)["prob"]
params64 = bench.build_problem_np64(prob, bench.HORIZON)
q0_anchor = np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_q0.npy"))
xi0_anchor = np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_xi0.npy"))

# NOTE: this probe drives the internal polish methods with hand-built
# LANE-layout state, so it pins sublanes=1 for the DF phase (the packed
# phase's end-to-end numbers live in records name=df_mixed_tpu); the f32
# phase runs packed via the solver's own entry points either way.
mx = MixedDFPipelineSolver(N=bench.HORIZON, dt=float(prob["dt"]),
                           f32_iterations=bench.ITERS, df_iterations=2,
                           batch_tile=256,
                           stage_chunk=bench.STAGE_CHUNK,
                           sublanes=1)
sp = split_pytree(params64)


def mk(seed):
    dq = 0.05 * jax.random.normal(jax.random.PRNGKey(seed), (B, 6),
                                  jnp.float32)
    return jax.device_put(SE3.normalize(
        jnp.asarray(q0_anchor, jnp.float32)[None] @ SE3.exp(dq)))


xi0s = jax.device_put(jnp.broadcast_to(
    jnp.asarray(xi0_anchor, jnp.float32), (B, 6)))
us0 = jax.device_put(jnp.zeros((B, bench.HORIZON, 6), jnp.float32))
prev = jax.config.jax_enable_x64
jax.config.update("jax_enable_x64", False)

nu = 6


def setup(qR, qp, xi, us):
    consts_df, refs_df, term_tail, Rdf, R32 = mx._df_setup(sp, B)
    lanes = lambda M: jnp.broadcast_to(M[..., None], M.shape + (B,))
    cost, dyn = sp["cost"], sp["dyn"]
    consts32 = dict(W1=lanes(cost.Q1[0]), Fu=consts_df["Fu"].hi,
                    Luu=lanes(2.0 * R32), P1=lanes(cost.P1[0]),
                    Jl=lanes(dyn.J[0]), Jil=lanes(dyn.Jinv[0]),
                    mg=jnp.zeros((1, B), jnp.float32))
    prom = lambda x: (x, jnp.zeros_like(x))
    return consts_df, refs_df, term_tail, Rdf, R32, consts32, \
        (prom(qR), prom(qp), prom(xi), prom(us))


def j_lin0(qR, qp, xi, us):
    consts_df, refs_df, _, _, _, consts32, st = setup(qR, qp, xi, us)
    qRd, qpd, xid, usd = (_df(x) for x in st)
    lin = mx._linearize_mx(qRd, qpd, xid, usd, refs_df, consts_df, consts32)
    return {k: (_pair(v) if not isinstance(v, jnp.ndarray) else v)
            for k, v in lin.items()}


def j_bwd(qR, qp, xi, us, lin_p):
    consts_df, refs_df, term_tail, Rdf, R32, consts32, st = setup(
        qR, qp, xi, us)
    qRd, qpd, xid, usd = (_df(x) for x in st)
    lin = {k: (_df(v) if isinstance(v, tuple) else v)
           for k, v in lin_p.items()}
    import trajectory_optimization_matrix_lie_groups_tpu.ops.dfx as dfx
    rows = []
    for i in range(nu):
        acc = dfx.promote(jnp.zeros_like(usd.hi[:, 0]))
        for j in range(nu):
            acc = acc + dfx.DF(Rdf.hi[i, j], Rdf.lo[i, j]) * usd[:, j]
        rows.append((acc * 2.0)[:, None])
    lu = dfx.concatenate(rows, axis=1)
    last = lambda d: _map_df(lambda x: x[-1], d)
    term = (last(qRd), last(qpd), last(xid)) + term_tail + (consts32["P1"],)
    k32, K32, gvec, lN32 = mx._backward_mx(lin, lu, term, consts_df,
                                           consts32)
    return k32, K32


def j_roll(qR, qp, xi, us, lin_p, k32, K32):
    consts_df, refs_df, _, _, _, consts32, st = setup(qR, qp, xi, us)
    qRd, qpd, xid, usd = (_df(x) for x in st)
    lin = {k: (_df(v) if isinstance(v, tuple) else v)
           for k, v in lin_p.items()}
    qRn, qpn, xin, usn, evals = mx._rollout_mx(qRd, qpd, xid, usd, k32,
                                               K32, lin, consts_df)
    return (_pair(qRn), _pair(qpn), _pair(xin), _pair(usn),
            tuple(_pair(e) for e in evals))


def j_tail(qRn_p, qpn_p, xin_p, evals_p, qR, qp, xi, us):
    consts_df, refs_df, _, _, _, consts32, _ = setup(qR, qp, xi, us)
    qRn, qpn, xin = _df(qRn_p), _df(qpn_p), _df(xin_p)
    evals = tuple(_df(e) for e in evals_p)
    lin = mx._linearize_tail_mx(qRn, qpn, xin, evals, refs_df, consts_df,
                                consts32)
    return {k: (_pair(v) if not isinstance(v, jnp.ndarray) else v)
            for k, v in lin.items()}


try:
    lane = mx._f32_jit(sp, mk(0), xi0s, us0)
    qR, qp, xi, us = lane
    jl0 = jax.jit(j_lin0)
    jb = jax.jit(j_bwd)
    jr = jax.jit(j_roll)
    jt = jax.jit(j_tail)

    lin_p = jl0(qR, qp, xi, us)
    k32, K32 = jb(qR, qp, xi, us, lin_p)
    ro = jr(qR, qp, xi, us, lin_p, k32, K32)
    lin2 = jt(ro[0], ro[1], ro[2], ro[4], qR, qp, xi, us)
    jax.block_until_ready((lin_p, k32, ro, lin2))

    def t2(fn, *args):
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            # host barrier on a SMALL data-dependent slice (shipping a
            # full (N,12,12,B) tensor through the tunnel costs seconds
            # and would dominate the measurement)
            leaf = jax.tree.leaves(out)[0]
            sl = leaf[(0,) * (leaf.ndim - 1)] if leaf.ndim else leaf
            _ = np.asarray(sl)
            best = min(best, time.perf_counter() - t0)
        return best

    t_lin0 = t2(jl0, qR, qp, xi, us)
    t_b = t2(jb, qR, qp, xi, us, lin_p)
    t_r = t2(jr, qR, qp, xi, us, lin_p, k32, K32)
    t_t = t2(jt, ro[0], ro[1], ro[2], ro[4], qR, qp, xi, us)
finally:
    jax.config.update("jax_enable_x64", prev)

result = dict(backend=jax.default_backend(), B=B,
              t_linearize0_s=round(t_lin0, 3),
              t_backward_s=round(t_b, 3),
              t_rollout_s=round(t_r, 3),
              t_linearize_tail_s=round(t_t, 3),
              t_iter_sum_s=round(t_b + t_r + t_t, 3))
print(json.dumps(result))
record("df_mixed_subphase_split", result)
