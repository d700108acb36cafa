"""Double-f32 MS-iLQR polish phase: lane-layout XLA on DF operands.

The f32 lane-layout Pallas pipeline (`solvers/pipeline.py`) converges to a
~1e-3 neighbourhood of the f64 fixed point: f32 rounding noise is amplified
~5e4x through the near-flat directions of the trajectory Hessian
(sigma_min(Quu) ~ 2R = 2e-5; scripts/probe_f32_precision.py).  The round-1
fix (`solvers/polish.HighPrecisionSolver`) reran two iterations through the
solver-layout XLA path in emulated f64 — correct, but ~365x below the
headline (47 solves/s at B=64).

This module runs the polish iterations in `ops/dfx.DF` double-f32
arithmetic (~49 mantissa bits) using the SAME lane-layout stage math as the
Pallas kernels (`riccati_stage`, `rollout_stage`, `stage_*` from
ops/pallas_linearize.py — all DF-polymorphic), but expressed as plain XLA:

  - stage-parallel work (linearization + GN quadratization) folds the
    stage axis into the VPU lane axis and evaluates ONE elementwise graph
    over (…, N*B) lanes;
  - the sequential recursions (Riccati backward, gap-closing rollout) are
    `lax.scan`s over stages whose bodies are the shared lane-layout stage
    functions on (…, B) lanes.

Why not Pallas for the DF phase: the DF kernel bodies trace to 25k-60k
primitives (every multiply is an error-free transformation), which is past
the remote TPU compiler's size ceiling (CLAUDE.md: HTTP 500s are
size-triggered; f32 bodies fail at ~20k) and pathological for XLA:CPU's
depth-superlinear passes.  Lane-layout XLA has no Mosaic size limit, fuses
the elementwise chains, and needs no layout transposes — the DF phase costs
~12x an f32 iteration in FLOPs, so a 12-f32 + 3-DF solve stays within ~4x
of the pure-f32 pipeline instead of 365x.

Accuracy: iLQR is locally contractive, so 2-4 DF iterations re-converge
into the flat valley of the true optimum; the residual vs the f64 golden is
the genuine flat-direction indeterminacy (~5e-5 < the 1e-4 BASELINE gate).
The reference solver stack is float64 end-to-end
(main_SE3ddp_tracking_exact_ms.py:36); this is the TPU-native answer to
that precision policy (SURVEY.md §7 hard part 5) at batch scale.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from trajectory_optimization_matrix_lie_groups_tpu.ops import dfx
from trajectory_optimization_matrix_lie_groups_tpu.ops import pallas_lie as pll
from trajectory_optimization_matrix_lie_groups_tpu.ops.pallas_linearize import (
    stage_cost_quad,
    stage_dynamics_eval,
    stage_jacobian,
)
from trajectory_optimization_matrix_lie_groups_tpu.solvers.pipeline import (
    NX,
    PallasPipelineSolver,
    riccati_stage,
    rollout_stage,
)

__all__ = ["DFPipelineSolver", "DFState", "split_pytree", "join_us"]


# -- DF <-> pair helpers ------------------------------------------------------

def _pair(d):
    return (d.hi, d.lo)


def _df(p):
    return dfx.DF(p[0], p[1])


def _map_df(fn, d):
    return dfx.DF(fn(d.hi), fn(d.lo))


# -- host-side split helpers --------------------------------------------------

def _split_np(x):
    """f64 host array -> stacked (2, ...) f32 [hi, lo]."""
    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return np.stack([hi, lo], axis=0)


def split_pytree(tree):
    """Split every float leaf of a host pytree into (2, ...) hi/lo stacks."""
    def leaf(x):
        x = np.asarray(x)
        if np.issubdtype(x.dtype, np.floating):
            return _split_np(x)
        return x
    return jax.tree.map(leaf, tree)


def join_us(state):
    """Combine a DFState's packed controls into host float64 (B, N, nu)."""
    return (np.asarray(state.us_hi, np.float64)
            + np.asarray(state.us_lo, np.float64))


class DFState(NamedTuple):
    qs: jnp.ndarray      # (B, N+1, 4, 4) f32 (hi parts)
    xis: jnp.ndarray     # (B, N+1, 6)    f32 (hi parts)
    us_hi: jnp.ndarray   # (B, N, nu) f32
    us_lo: jnp.ndarray   # (B, N, nu) f32 compensation terms
    J_opt: jnp.ndarray   # (B,)
    grad_norm: jnp.ndarray  # (B,)


class DFPipelineSolver:
    """f32 Pallas pipeline + double-f32 lane-layout XLA polish.

    Parameters
    ----------
    N, dt : horizon and step (match the f32 pipeline).
    f32_iterations : ordinary fused-pipeline iterations (phase 1).
    df_iterations : double-f32 polish iterations warm-started from phase 1;
        2-4 suffice (module docstring).
    batch_tile, stage_chunk, gravity, exact_gravity_jacobian, interpret :
        forwarded to the f32 `PallasPipelineSolver` phase.
    """

    def __init__(self, N: int, dt: float, f32_iterations: int = 12,
                 df_iterations: int = 3, batch_tile: int = None,
                 gravity: bool = False, exact_gravity_jacobian: bool = False,
                 stage_chunk: int = 1, interpret: bool = False,
                 sublanes: int = 1, df_batch_tile: int = None):
        """``sublanes``: sublane-packed layout (pipeline.py ``sublanes``)
        for BOTH phases — the f32 pipeline and (in the mixed driver) the
        polish kernels; the full-DF polish driver unpacks at the phase
        boundary and stays lane-layout.  ``df_batch_tile``: batch tile for
        the polish-phase kernels (df_mixed kernel_polish) — defaults to
        ``batch_tile`` (sublane-packed: 1024, the smallest tile that fills
        the 128-lane axis at S=8 and ALSO the largest that fits: the DF
        riccati's blocks VMEM-OOM at packed tile 2048 chunk 1 and at tile
        1024 chunk 2, both measured round 5)."""
        self.N = N
        self.dt = float(dt)
        self.f32_iterations = f32_iterations
        self.df_iterations = df_iterations
        self.gravity = gravity
        self.exact_grav = exact_gravity_jacobian
        if df_batch_tile is None:
            df_batch_tile = batch_tile if sublanes == 1 else 1024
        self.df_batch_tile = df_batch_tile
        self.base = PallasPipelineSolver(
            N=N, iterations=f32_iterations, dt=dt, interpret=interpret,
            batch_tile=batch_tile, gravity=gravity,
            exact_gravity_jacobian=exact_gravity_jacobian,
            stage_chunk=stage_chunk, fused=True, sublanes=sublanes)
        # two separate jits: XLA compile cost is superlinear in module size
        # for these graphs (the DF phase alone is ~100k primitives), so one
        # combined module compiles far slower than the sum of its phases
        self._f32_jit = jax.jit(self._solve_f32)
        self._df_jit = jax.jit(self._solve_df)

    def _df_tiles(self, B):
        """(n_tiles, tile) for the polish-phase kernels."""
        bt = B if self.df_batch_tile is None else min(self.df_batch_tile, B)
        if B % bt:
            raise ValueError(f"batch {B} not divisible by df_batch_tile {bt}")
        return B // bt, bt

    # -- DF phase pieces (plain XLA, lane layout) --------------------------

    def _linearize_df(self, qR, qp, xi, us, refs, consts):
        """All-stage linearization: stage axis folded into the lanes.

        qR (N+1,3,3,B), qp (N+1,3,B), xi (N+1,6,B), us (N,nu,B) as DF;
        refs/consts as DF lane tensors.  Returns dict of DF (N, ..., B).
        """
        N = self.N
        B = us.hi.shape[-1]

        def fold(d, drop_last=0):
            # (N[+1], ..., B) -> (..., N*B); optionally drop the last stage
            def f(x):
                x = x[:N] if drop_last else x
                x = jnp.moveaxis(x, 0, -2)
                return x.reshape(x.shape[:-2] + (N * B,))
            return _map_df(f, d)

        def tile(d):
            # (..., B) const -> (..., N*B)
            def f(x):
                x = jnp.broadcast_to(x[..., None, :], x.shape[:-1] + (N, B))
                return x.reshape(x.shape[:-2] + (N * B,))
            return _map_df(f, d)

        def unfold(d):
            def f(x):
                x = x.reshape(x.shape[:-1] + (N, B))
                return jnp.moveaxis(x, -2, 0)
            return _map_df(f, d)

        R = fold(_map_df(lambda x: x[:-1], qR))
        p = fold(_map_df(lambda x: x[:-1], qp))
        Rn = fold(_map_df(lambda x: x[1:], qR))
        pn = fold(_map_df(lambda x: x[1:], qp))
        xis = fold(_map_df(lambda x: x[:-1], xi))
        xin = fold(_map_df(lambda x: x[1:], xi))
        u = fold(us)
        Jl, Jil = tile(consts["Jl"]), tile(consts["Jil"])
        W1, W2 = tile(consts["W1"]), tile(consts["W2"])
        Pu, mg = tile(consts["Pu"]), tile(consts["mg"])

        fqR, fqp, fxi = stage_dynamics_eval(
            R, p, xis, u, Jl, Jil, Pu, mg, dt=self.dt, gravity=self.gravity)
        Rni, pni = pll.se3_inverse(Rn, pn)
        Rd, pd = pll.se3_compose(Rni, pni, fqR, fqp)
        d = dfx.concatenate([pll.se3_log(Rd, pd), fxi - xin], axis=0)
        Fx = stage_jacobian(R, xis, Jl, Jil, mg, dt=self.dt,
                            gravity=self.gravity, exact_grav=self.exact_grav)
        lx, lxx, l_val = stage_cost_quad(
            R, p, xis, fold(refs["RbiR"]), fold(refs["Rbip"]),
            fold(refs["Adb"]), fold(refs["xib"]), W1, W2)

        out = dict(fqR=fqR, fqp=fqp, fxi=fxi, d=d, Fx=Fx, lx=lx, lxx=lxx,
                   l=_map_df(lambda x: x[None], l_val))
        return {k: unfold(v) for k, v in out.items()}

    def _backward_df(self, lin, lu, term, consts):
        """Reverse scan over stages; body = shared `riccati_stage`."""
        qRN, qpN, xiN, RbiRN, RbipN, AdbN, xibN, W1N, W2N = term
        lxN, lxxN, lN = stage_cost_quad(
            qRN, qpN, xiN, RbiRN, RbipN, AdbN, xibN, W1N, W2N)
        Fu = consts["Fu"]
        fu2 = Fu[6:]
        fu2T = pll.transpose(fu2)
        Luu = consts["Luu"]
        nu = lu.hi.shape[-2]

        def step(carry, inp):
            Vx, Vxx = _df(carry[0]), _df(carry[1])
            fx, dd, lx_t, lu_t, lxx_t = (_df(x) for x in inp)
            k, K, Qu, Vx_n, Vxx_n = riccati_stage(
                fx, dd, lx_t, lu_t, lxx_t, fu2, fu2T, Luu, Vx, Vxx,
                nu=nu, glow=self.gravity)
            return ((_pair(Vx_n), _pair(Vxx_n)),
                    (_pair(k), _pair(K), _pair(Qu)))

        xs = (_pair(lin["Fx"]), _pair(lin["d"]), _pair(lin["lx"]),
              _pair(lu), _pair(lin["lxx"]))
        (_, _), (k, K, gvec) = lax.scan(
            step, (_pair(lxN), _pair(lxxN)), xs, reverse=True)
        return _df(k), _df(K), _df(gvec), lN

    def _rollout_df(self, qR, qp, xi, us, k, K, lin, consts):
        """Forward scan: shared gap-closing `rollout_stage` per step."""
        Jl, Jil = consts["Jl"], consts["Jil"]
        Pu, mg = consts["Pu"], consts["mg"]

        def step(carry, inp):
            R_new, p_new, xi_new = (_df(c) for c in carry)
            (qR_t, qp_t, qRn_t, qpn_t, xi_t, xin_t, u_t, k_t, K_t, d_t,
             fqR_t, fqp_t, fxi_t) = (_df(x) for x in inp)
            R_nn, p_nn, xi_nn, u_new, _, _, _ = rollout_stage(
                R_new, p_new, xi_new, qR_t, qp_t, qRn_t, qpn_t, xi_t,
                xin_t, u_t, k_t, K_t, d_t, fqR_t, fqp_t, fxi_t,
                Jl, Jil, Pu, mg, dt=self.dt, gravity=self.gravity)
            return ((_pair(R_nn), _pair(p_nn), _pair(xi_nn)),
                    (_pair(R_nn), _pair(p_nn), _pair(xi_nn), _pair(u_new)))

        sl = lambda d, s: _map_df(lambda x: x[s], d)
        xs = (_pair(sl(qR, slice(None, -1))), _pair(sl(qp, slice(None, -1))),
              _pair(sl(qR, slice(1, None))), _pair(sl(qp, slice(1, None))),
              _pair(sl(xi, slice(None, -1))), _pair(sl(xi, slice(1, None))),
              _pair(us), _pair(k), _pair(K), _pair(lin["d"]),
              _pair(lin["fqR"]), _pair(lin["fqp"]), _pair(lin["fxi"]))
        init = (_pair(sl(qR, 0)), _pair(sl(qp, 0)), _pair(sl(xi, 0)))
        _, (oR, op, oxi, ou) = lax.scan(step, init, xs)
        first = lambda d: _map_df(lambda x: x[:1], d)
        app = lambda a, b: dfx.DF(
            jnp.concatenate([a.hi, b.hi], axis=0),
            jnp.concatenate([a.lo, b.lo], axis=0))
        qR_new = app(first(qR), _df(oR))
        qp_new = app(first(qp), _df(op))
        xi_new = app(first(xi), _df(oxi))
        return qR_new, qp_new, xi_new, _df(ou)

    # -- driver ------------------------------------------------------------

    def _solve_f32(self, sp, q0s, xi0s, us0, al=None):
        """Phase 1: the plain-f32 fused Pallas pipeline (hi parts of the
        split params reproduce the f32 path).  Returns lane-layout state.
        ``al``: optional input-box AL state (lb (nu,), ub (nu,),
        lmbd (B, N+1, 2nu), imu (B, N+1, 2nu)) — same contract as
        `pipeline.PallasPipelineSolver._solve`."""
        B = q0s.shape[0]
        N = self.N
        dtp = jnp.float32
        dyn, cost = sp["dyn"], sp["cost"]
        nu = us0.shape[-1]
        # sublane-packed base (pipeline.py ``sublanes``): run the whole f32
        # phase in the packed layout, unpack once at the phase boundary
        pk = self.base._pack
        nbd = 1 if self.base.S == 1 else 2

        # ---- phase-1 (f32) data: hi parts reproduce the plain f32 path ----
        hi = lambda x: x[0]
        lanes = lambda M: pk(jnp.broadcast_to(M[..., None], M.shape + (B,)))
        Pu2 = dyn.Pu if hasattr(dyn, "Pu") else _split_np(np.eye(6))
        Pu2 = jnp.asarray(Pu2, dtp)
        if self.gravity:
            mg_df = dfx.DF(dyn.m[0], dyn.m[1]) * dfx.DF(dyn.g[0], dyn.g[1])
            mg2 = jnp.stack([mg_df.hi, mg_df.lo])
        else:
            mg2 = jnp.zeros((2,), dtp)
        bt6 = hi(dyn.Jinv) @ hi(Pu2)
        Fu_hi = jnp.concatenate(
            [jnp.zeros_like(bt6), bt6], axis=-2) * hi(dyn.dt)
        consts32 = dict(
            Jl=lanes(hi(dyn.J)), Jil=lanes(hi(dyn.Jinv)),
            W1=lanes(hi(cost.Q1)), W2=lanes(hi(cost.Q2)),
            Fu=lanes(Fu_hi), Luu=lanes(2.0 * hi(cost.R)),
            Pu=lanes(hi(Pu2)), mg=pk(jnp.broadcast_to(mg2[0], (1, B))),
        )
        ref32 = lambda x: pk(jnp.moveaxis(jnp.broadcast_to(
            x[:, None], (x.shape[0], B) + x.shape[1:]), 1, -1))
        qri_hi = hi(cost.q_ref_inv)
        refs32 = dict(
            RbiR=ref32(qri_hi[:-1, :3, :3]),
            Rbip=ref32(qri_hi[:-1, :3, 3]),
            Adb=ref32(hi(cost.Ad_ref)[:-1]),
            xib=ref32(hi(cost.xi_ref)[:-1]),
        )
        term32 = (ref32(qri_hi[-1:, :3, :3])[0], ref32(qri_hi[-1:, :3, 3])[0],
                  ref32(hi(cost.Ad_ref)[-1:])[0],
                  ref32(hi(cost.xi_ref)[-1:])[0],
                  lanes(hi(cost.P1)), lanes(hi(cost.P2)))

        # initial lane-layout state: x0 + reference tail
        q_ref_hi = hi(cost.q_ref)
        q_ref_b = jnp.broadcast_to(q_ref_hi[1:][:, None], (N, B, 4, 4))
        qR = jnp.concatenate([jnp.moveaxis(q0s[None, :, :3, :3], 1, -1),
                              jnp.moveaxis(q_ref_b[:, :, :3, :3], 1, -1)],
                             axis=0)
        qp = jnp.concatenate([jnp.moveaxis(q0s[None, :, :3, 3], 1, -1),
                              jnp.moveaxis(q_ref_b[:, :, :3, 3], 1, -1)],
                             axis=0)
        xi_ref_b = jnp.broadcast_to(hi(cost.xi_ref)[1:][:, None], (N, B, 6))
        xi = jnp.concatenate([jnp.moveaxis(xi0s[None], 1, -1),
                              jnp.moveaxis(xi_ref_b, 1, -1)], axis=0)
        us = jnp.moveaxis(us0, 0, -1)  # (N, nu, B)
        qR, qp, xi, us = pk(qR), pk(qp), pk(xi), pk(us)

        R32 = hi(cost.R)
        if al is not None:
            lb_a, ub_a, lmbd_a, imu_a = al
            lam_l = pk(jnp.moveaxis(lmbd_a, 0, -1).astype(dtp))
            imu_l = pk(jnp.moveaxis(imu_a, 0, -1).astype(dtp))
            lam_lo, lam_hi = lam_l[:-1, :nu], lam_l[:-1, nu:]
            im_lo, im_hi = imu_l[:-1, :nu], imu_l[:-1, nu:]
            lb32 = jnp.asarray(lb_a, dtp).reshape((1, nu) + (1,) * nbd)
            ub32 = jnp.asarray(ub_a, dtp).reshape((1, nu) + (1,) * nbd)
            luu_al = im_lo + im_hi
        else:
            luu_al = None

        def f32_body(_, carry):
            qR, qp, xi, us, lin = carry
            lu = 2.0 * jnp.einsum("ij,nj...->ni...", R32, us)
            if al is not None:
                glo = lb32 - us
                ghi = us - ub32
                lu = lu - (lam_lo + im_lo * glo) + (lam_hi + im_hi * ghi)
            term = (qR[-1], qp[-1], xi[-1]) + term32
            k, K, gvec, lN = self.base._backward_lane(lin, lu, term, consts32,
                                                      luu_al=luu_al)
            qR, qp, xi, us, lin = self.base._rollout_linearize_lane(
                qR, qp, xi, us, k, K, lin, refs32, consts32)
            return qR, qp, xi, us, lin

        lin0 = self.base._linearize_lane(qR, qp, xi, us, refs32, consts32)
        qR, qp, xi, us, _ = lax.fori_loop(
            0, self.f32_iterations, f32_body, (qR, qp, xi, us, lin0))
        upk = self.base._unpack
        return upk(qR), upk(qp), upk(xi), upk(us)

    def _df_setup(self, sp, B):
        """Lane-layout DF constants/references shared by the full-DF and
        mixed-precision (solvers/df_mixed.py) polish drivers.  Returns
        (consts_df, refs_df, term_tail, Rdf, R32)."""
        dtp = jnp.float32
        dyn, cost = sp["dyn"], sp["cost"]
        hi = lambda x: x[0]
        lanes = lambda M: jnp.broadcast_to(M[..., None], M.shape + (B,))
        ref32 = lambda x: jnp.moveaxis(jnp.broadcast_to(
            x[:, None], (x.shape[0], B) + x.shape[1:]), 1, -1)
        Pu2 = dyn.Pu if hasattr(dyn, "Pu") else _split_np(np.eye(6))
        Pu2 = jnp.asarray(Pu2, dtp)
        if self.gravity:
            mg_df = dfx.DF(dyn.m[0], dyn.m[1]) * dfx.DF(dyn.g[0], dyn.g[1])
            mg2 = jnp.stack([mg_df.hi, mg_df.lo])
        else:
            mg2 = jnp.zeros((2,), dtp)
        R32 = hi(cost.R)
        dfc = lambda s2: dfx.DF(lanes(s2[0]), lanes(s2[1]))   # const
        dfr = lambda s2: dfx.DF(ref32(s2[0]), ref32(s2[1]))   # per-stage ref

        Fu2 = _fu_df(dyn.Jinv, Pu2, dyn.dt)                   # (2, 12, nu)
        consts_df = dict(
            Jl=dfc(dyn.J), Jil=dfc(dyn.Jinv), W1=dfc(cost.Q1),
            W2=dfc(cost.Q2), Fu=dfc(Fu2),
            # 2x scaling is exact in f32: scaling both components is a
            # valid DF multiply by 2
            Luu=dfc(2.0 * cost.R),
            Pu=dfc(Pu2), mg=dfc(mg2[:, None]),
        )
        qri = cost.q_ref_inv  # (2, N+1, 4, 4)
        refs_df = dict(
            RbiR=dfr(qri[:, :-1, :3, :3]),
            Rbip=dfr(qri[:, :-1, :3, 3]),
            Adb=dfr(cost.Ad_ref[:, :-1]),
            xib=dfr(cost.xi_ref[:, :-1]),
        )
        one = lambda d: _map_df(lambda x: x[0], d)
        term_tail = (one(dfr(qri[:, -1:, :3, :3])),
                     one(dfr(qri[:, -1:, :3, 3])),
                     one(dfr(cost.Ad_ref[:, -1:])),
                     one(dfr(cost.xi_ref[:, -1:])),
                     dfc(cost.P1), dfc(cost.P2))
        Rdf = dfx.DF(cost.R[0], cost.R[1])  # (nu, nu)
        return consts_df, refs_df, term_tail, Rdf, R32

    def _solve_df(self, sp, qR, qp, xi, us, al=None):
        """Phase 2: double-f32 polish (plain XLA, lane layout) from the
        phase-1 lane state."""
        if al is not None:
            raise NotImplementedError(
                "AL terms in the polish phase are implemented by "
                "MixedDFPipelineSolver; the full-DF driver ignores them")
        B = qR.shape[-1]
        N = self.N
        dtp = jnp.float32
        nu = us.shape[-2]
        prom = lambda x: dfx.DF(x, jnp.zeros_like(x))
        consts_df, refs_df, term_tail, Rdf, R32 = self._df_setup(sp, B)

        qRd, qpd, xid, usd = prom(qR), prom(qp), prom(xi), prom(us)

        def lu_glue(usd):
            rows = []
            for i in range(nu):
                acc = dfx.promote(jnp.zeros_like(usd.hi[:, 0]))
                for j in range(nu):
                    acc = acc + dfx.DF(Rdf.hi[i, j], Rdf.lo[i, j]) * usd[:, j]
                rows.append((acc * 2.0)[:, None])
            return dfx.concatenate(rows, axis=1)  # (N, nu, B) DF

        last = lambda d: _map_df(lambda x: x[-1], d)

        def df_body(_, carry):
            qRd, qpd, xid, usd, lin = (
                _df(carry[0]), _df(carry[1]), _df(carry[2]), _df(carry[3]),
                {k: _df(v) for k, v in carry[4].items()})
            lu = lu_glue(usd)
            term = (last(qRd), last(qpd), last(xid)) + term_tail
            k, K, gvec, lN = self._backward_df(lin, lu, term, consts_df)
            qRd, qpd, xid, usd = self._rollout_df(
                qRd, qpd, xid, usd, k, K, lin, consts_df)
            lin = self._linearize_df(qRd, qpd, xid, usd, refs_df, consts_df)
            return (_pair(qRd), _pair(qpd), _pair(xid), _pair(usd),
                    {k2: _pair(v) for k2, v in lin.items()})

        lin_d = self._linearize_df(qRd, qpd, xid, usd, refs_df, consts_df)
        carry = (_pair(qRd), _pair(qpd), _pair(xid), _pair(usd),
                 {k: _pair(v) for k, v in lin_d.items()})
        carry = lax.fori_loop(0, self.df_iterations, df_body, carry)
        qRd, qpd, xid, usd = (_df(carry[0]), _df(carry[1]), _df(carry[2]),
                              _df(carry[3]))
        lin_d = {k: _df(v) for k, v in carry[4].items()}

        # final metrics: one more backward at the final iterate
        lu = lu_glue(usd)
        term = (last(qRd), last(qpd), last(xid)) + term_tail
        _, _, gvec, lN = self._backward_df(lin_d, lu, term, consts_df)
        gsum = gvec.hi + gvec.lo
        g = jnp.mean(jnp.sqrt(jnp.sum(gsum * gsum, axis=1)), axis=0)
        us_j = usd.hi + usd.lo
        J = (jnp.sum(lin_d["l"].hi[:, 0] + lin_d["l"].lo[:, 0], axis=0)
             + jnp.einsum("nib,ij,njb->b", us_j, R32, us_j)
             + lN.hi + lN.lo)

        # back to solver layout (hi parts for poses; us keeps hi+lo)
        bk = lambda x: jnp.moveaxis(x, -1, 0)
        qs = jnp.zeros((B, N + 1, 4, 4), dtp)
        qs = qs.at[:, :, :3, :3].set(bk(qRd.hi))
        qs = qs.at[:, :, :3, 3].set(bk(qpd.hi))
        qs = qs.at[:, :, 3, 3].set(1.0)
        return DFState(qs=qs, xis=bk(xid.hi), us_hi=bk(usd.hi),
                       us_lo=bk(usd.lo), J_opt=J, grad_norm=g)

    def solve(self, params, q0s, xi0s, us0, al=None):
        """params: {'dyn': SE3Params/RigidBodyParams, 'cost':
        TrackingCostParams} as float64 HOST (numpy) values — split on the
        host so full precision survives without x64 on device.

        ``al``: optional input-box AL state (lb (nu,), ub (nu,),
        lmbd (B, N+1, 2nu), imu (B, N+1, 2nu)) at FIXED multipliers —
        both phases then minimize the augmented Lagrangian, so the polish
        refines a constrained (active-set) solve; supported by the mixed
        driver (`MixedDFPipelineSolver`), not the full-DF one.

        The whole program is f32 (hi/lo pairs), so it is traced and run
        with x64 OFF regardless of the caller's setting: under x64,
        index/iota arithmetic traces as int64 (Mosaic rejects it in the
        f32 phase) and — measured — tracing the large DF graphs slows
        >25x through x64 type canonicalization.

        Problem inputs (q0s/xi0s/us0) that are ALREADY f32 device arrays
        are passed through untouched — pre-stage them with
        `jax.device_put` to keep their transfer out of a timed solve (at
        bench scale us0 alone is ~20 MB, ~0.5 s through the remote
        tunnel); anything else is converted host-side as before."""
        sp = split_pytree(params)

        def stage(x):
            if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32:
                return x
            return np.asarray(x, np.float32)

        q0f = stage(q0s)
        xif = stage(xi0s)
        usf = stage(us0)
        if al is not None:
            lb_a, ub_a, lmbd_a, imu_a = al
            nu = np.shape(us0)[-1]
            al = (np.broadcast_to(np.asarray(lb_a, np.float32), (nu,)),
                  np.broadcast_to(np.asarray(ub_a, np.float32), (nu,)),
                  stage(lmbd_a), stage(imu_a))
        prev = jax.config.jax_enable_x64
        jax.config.update("jax_enable_x64", False)
        try:
            lane_state = self._f32_jit(sp, q0f, xif, usf, al)
            out = self._df_jit(sp, *lane_state, al)
            jax.block_until_ready(out)
        finally:
            jax.config.update("jax_enable_x64", prev)
        return out


def _fu_df(Jinv2, Pu2, dt2):
    """DF-accurate Fu = [0; Jinv Pu] dt from split operands, as a
    (2, 12, nu) hi/lo stack (computed in DF arithmetic, trace-time XLA)."""
    Ji = dfx.DF(Jinv2[0], Jinv2[1])
    Pu = dfx.DF(Pu2[0], Pu2[1])
    dt = dfx.DF(dt2[0], dt2[1])
    nu = Pu2.shape[-1]
    rows = []
    for i in range(6):
        cols = []
        for j in range(nu):
            acc = dfx.const(0.0)
            for kk in range(6):
                acc = acc + Ji[i, kk] * Pu[kk, j]
            cols.append((acc * dt)[None])
        rows.append(dfx.concatenate(cols, axis=0)[None])
    bt6 = dfx.concatenate(rows, axis=0)  # (6, nu) DF
    z = dfx.zeros_like(bt6)
    full = dfx.concatenate([z, bt6], axis=0)  # (12, nu) DF
    return jnp.stack([full.hi, full.lo], axis=0)
