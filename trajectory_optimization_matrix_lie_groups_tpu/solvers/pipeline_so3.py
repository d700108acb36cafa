"""Lane-layout Pallas MS-iLQR pipeline for the SO(3) family.

SE(3)-family problems run on `solvers/pipeline.PallasPipelineSolver`; this
module is its SO(3) twin covering BOTH SO(3)-family dynamics of the
reference:

  - free rigid-body attitude (`SO3Dynamics`, traopt_dynamics.py:275-419):
    constant Fu = [0; Jinv] dt;
  - the 3-D pendulum actuated at the pivot (`Pendulum3dDyanmics`,
    traopt_dynamics.py:421-627): gravity torque hat(m g rho) R^T down and
    input moment hat(m rho) R^T u — both state-dependent — computed
    in-kernel, giving a PER-STAGE Fu = [0; Jinv hat(m rho) R^T] dt that
    rides the Riccati kernel as one extra gridded input.

Same 2-kernel fused layout as the SE(3) pipeline (Riccati backward;
rollout fused with the next iteration's linearization), state dim nx = 6
(pose half 3), nu = 3.  The Riccati stage math is shared
(`pipeline.riccati_stage(half=3, glow=pendulum)` — the pendulum's L block
occupies the same bottom-left slot as the SE(3) gravity J_xi_q block).

The terminal quadratization replicates the reference SO(3) cost class's
quirk (value+gradient from Q, Hessian from P — traopt_cost.py:477-487 vs
:526-531; `models/costs.py` docstring) behind ``term_quirk`` (default True,
matching every SO(3)-family parity build).
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trajectory_optimization_matrix_lie_groups_tpu.ops import pallas_lie as pll
from trajectory_optimization_matrix_lie_groups_tpu.solvers.pipeline import (
    _DIMSEM,
    _DIMSEM_PAR,
    PallasPipelineSolver,
    riccati_stage,
)

NX, NU, H = 6, 3, 3


def _cross(a, b):
    return pll._vec([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


# -- stage math (lane layout, shared by the kernels) --------------------------

def so3_stage_dynamics_eval(R, xi, u, Jl, Jil, mgr, mr, *, dt, pendulum):
    """Euler step: fq = normalize(R Exp(xi dt)); fxi = xi + dt Jinv torque
    with torque = hat(xi)^T J xi + u (free) or + gravity/input moments
    (pendulum; models/dynamics.py:135-146)."""
    Re = pll.so3_exp(xi * dt)
    fqR = pll.so3_normalize(pll.matmul3(R, Re))
    Jxi = pll.matvec3(Jl, xi)
    torque = -_cross(xi, Jxi)
    if pendulum:
        Rt = pll.transpose(R)
        Rtd = -R[2]                      # R^T (0,0,-1) = -(third row of R)
        torque = torque + _cross(mgr, Rtd) + _cross(mr, pll.matvec3(Rt, u))
    else:
        torque = torque + u
    fxi = xi + dt * pll.matvec3(Jil, torque)
    return fqR, fxi


def so3_stage_jacobian(R, xi, u, Jl, Jil, mgr, mr, *, dt, pendulum):
    """Lane-layout (Fx, fu2): Fx = [[Exp(-tau), Jr(tau) dt], [L dt, I+H dt]]
    (L = 0 for the free body), fu2 = bottom half of Fu
    (models/dynamics.py:90-103 free, :148-168 pendulum)."""
    bs = xi.shape[1:]  # trailing batch dims: (B,) or (S, L)
    dtp = xi.dtype
    tau = xi * dt
    J_q_q = pll.so3_exp(-tau)
    J_q_xi = pll.so3_left_jacobian(-tau) * dt    # Jr(tau) dt
    G = pll.hat(pll.matvec3(Jl, xi))
    H_blk = pll.matmul3(Jil, G - pll.matmul3(pll.hat(xi), Jl))
    eye = pll._eye3(dtp, bs)
    D = eye + H_blk * dt
    if pendulum:
        Rt = pll.transpose(R)
        # hat(down) R with down = (0,0,-1): rows (R[1], -R[0], 0)
        z = jnp.zeros_like(R[0, 0])
        hdR = pll._mat3([[R[1, 0], R[1, 1], R[1, 2]],
                         [-R[0, 0], -R[0, 1], -R[0, 2]],
                         [z, z, z]])
        L1 = pll.matmul3(pll.hat(mgr), pll.matmul3(Rt, hdR))
        L2 = pll.matmul3(pll.hat(mr),
                         pll.matmul3(Rt, pll.matmul3(pll.hat(u), R)))
        C = pll.matmul3(Jil, L1 + L2) * dt
        fu2 = pll.matmul3(Jil, pll.matmul3(pll.hat(mr), Rt)) * dt
    else:
        C = jnp.zeros((3, 3) + bs, dtp)
        fu2 = Jil * dt
    return pll.blk(J_q_q, J_q_xi, C, D), fu2


def so3_stage_cost_quad(R, xi, RbiR, xib, W1v, W2v, W1h, W2h):
    """GN tracking quadratization on SO(3): e = Log(R Rref^-1),
    J_e_x = Jr^-1(e) Ad(Rref) with Ad(Rref) = Rref = RbiR^T.

    (W1v, W2v) weight the value+gradient, (W1h, W2h) the Hessian — equal
    for stage costs; the terminal SO(3) quirk passes (Q, P)
    (traopt_cost.py:477-487 vs :526-531).  Returns (lx, lxx, l)."""
    bs = xi.shape[1:]
    dtp = xi.dtype
    e = pll.so3_log(pll.matmul3(R, RbiR))
    ev = xi - xib
    Adb = pll.transpose(RbiR)
    Jex = pll.matmul3(pll.so3_left_jacobian_inv(-e), Adb)   # Jr_inv(e) Adb
    JT2 = 2.0 * pll.transpose(Jex)
    W1e = pll.matvec3(W1v, e)
    W2ev = pll.matvec3(W2v, ev)
    lx = jnp.concatenate([pll.matvec3(JT2, W1e), 2.0 * W2ev], axis=0)
    H_e = pll.matmul3(pll.matmul3(2.0 * pll.transpose(Jex), W1h), Jex)
    Z = jnp.zeros((3, 3) + bs, dtp)
    lxx = pll.blk(H_e, Z, Z, 2.0 * W2h)
    l_val = (sum(e[i] * W1e[i] for i in range(3))
             + sum(ev[i] * W2ev[i] for i in range(3)))
    return lx, lxx, l_val


def so3_rollout_stage(R_new, xi_new, R_t, Rn_t, xi_t, xin_t, u_t, k_t, K_t,
                      d_t, fqR_t, fxi_t, Jl, Jil, mgr, mr, *, dt, pendulum):
    """Gap-closing rollout step (SO(3) twin of pipeline.rollout_stage;
    ref traopt_controller.py:1383-1407)."""
    xs_err = jnp.concatenate(
        [pll.so3_log(pll.matmul3(pll.transpose(R_t), R_new)),
         xi_new - xi_t], axis=0)
    u_new = u_t + k_t + sum(
        K_t[:, j, :] * xs_err[j:j + 1, :] for j in range(NX))
    fqR_n, fxi_n = so3_stage_dynamics_eval(
        R_new, xi_new, u_new, Jl, Jil, mgr, mr, dt=dt, pendulum=pendulum)
    R_a = pll.matmul3(Rn_t, pll.so3_exp(d_t[:3]))
    R_b = pll.matmul3(R_a, pll.transpose(fqR_t))
    R_nn = pll.so3_normalize(pll.matmul3(R_b, fqR_n))
    xi_nn = xin_t + fxi_n - fxi_t + d_t[3:]
    return R_nn, xi_nn, u_new, fqR_n, fxi_n


# -- kernels ------------------------------------------------------------------

def _linearize_kernel_so3(qR_ref, qRn_ref, xi_ref, xin_ref, u_ref,
                          RbiR_ref, xib_ref, Jl_ref, Jil_ref, W1_ref, W2_ref,
                          mgr_ref, mr_ref,
                          fqR_ref, fxi_ref, d_ref, Fx_ref, fu2_ref, lx_ref,
                          lxx_ref, l_ref, *, dt, pendulum, chunk=1):
    for t in range(chunk):
        R, xi, u = qR_ref[t], xi_ref[t], u_ref[t]
        fqR, fxi = so3_stage_dynamics_eval(
            R, xi, u, Jl_ref[:], Jil_ref[:], mgr_ref[:], mr_ref[:],
            dt=dt, pendulum=pendulum)
        d = jnp.concatenate(
            [pll.so3_log(pll.matmul3(pll.transpose(qRn_ref[t]), fqR)),
             fxi - xin_ref[t]], axis=0)
        Fx, fu2 = so3_stage_jacobian(
            R, xi, u, Jl_ref[:], Jil_ref[:], mgr_ref[:], mr_ref[:],
            dt=dt, pendulum=pendulum)
        lx, lxx, l_val = so3_stage_cost_quad(
            R, xi, RbiR_ref[t], xib_ref[t], W1_ref[:], W2_ref[:],
            W1_ref[:], W2_ref[:])
        fqR_ref[t] = fqR
        fxi_ref[t] = fxi
        d_ref[t] = d
        Fx_ref[t] = Fx
        fu2_ref[t] = fu2
        lx_ref[t] = lx
        lxx_ref[t] = lxx
        l_ref[t] = l_val[None, :]


def _riccati_kernel_so3(Fx_ref, fu2_ref, d_ref, lx_ref, lu_ref, lxx_ref,
                        qRN_ref, xiN_ref, RbiRN_ref, xibN_ref,
                        W1vN_ref, W2vN_ref, W1hN_ref, W2hN_ref, Luu_ref,
                        k_ref, K_ref, gvec_ref, lN_ref, Vx_s, Vxx_s,
                        *, chunk=1, pendulum=False):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        lxN, lxxN, lN = so3_stage_cost_quad(
            qRN_ref[:], xiN_ref[:], RbiRN_ref[:], xibN_ref[:],
            W1vN_ref[:], W2vN_ref[:], W1hN_ref[:], W2hN_ref[:])
        Vx_s[:] = lxN
        Vxx_s[:] = lxxN
        lN_ref[0] = lN[None]

    Luu = Luu_ref[:]
    Vx = Vx_s[:]
    Vxx = Vxx_s[:]
    for t in reversed(range(chunk)):
        fu2 = fu2_ref[t]
        k, K, Qu, Vx, Vxx = riccati_stage(
            Fx_ref[t], d_ref[t], lx_ref[t], lu_ref[t], lxx_ref[t],
            fu2, pll.transpose(fu2), Luu, Vx, Vxx,
            nu=NU, glow=pendulum, half=H)
        k_ref[t] = k
        K_ref[t] = K
        gvec_ref[t] = Qu
    Vx_s[:] = Vx
    Vxx_s[:] = Vxx


def _rollout_linearize_kernel_so3(
        qR_ref, qRn_ref, xi_ref, xin_ref, u_ref, k_ref, K_ref, d_ref,
        fqR_ref, fxi_ref, RbiR_ref, xib_ref,
        Jl_ref, Jil_ref, W1_ref, W2_ref, mgr_ref, mr_ref,
        oR_ref, oxi_ref, ou_ref,
        nfqR_ref, nfxi_ref, nd_ref, nFx_ref, nfu2_ref, nlx_ref, nlxx_ref,
        nl_ref, R_s, xi_s, *, dt, pendulum, chunk=1):
    """Rollout of stage t fused with the linearization of the NEW stage t
    (SO(3) twin of pipeline._rollout_linearize_kernel)."""
    @pl.when(pl.program_id(1) == 0)
    def _init():
        R_s[:] = qR_ref[0]
        xi_s[:] = xi_ref[0]

    R_new, xi_new = R_s[:], xi_s[:]
    for t in range(chunk):
        R_nn, xi_nn, u_new, fqR_n, fxi_n = so3_rollout_stage(
            R_new, xi_new, qR_ref[t], qRn_ref[t], xi_ref[t], xin_ref[t],
            u_ref[t], k_ref[t], K_ref[t], d_ref[t], fqR_ref[t], fxi_ref[t],
            Jl_ref[:], Jil_ref[:], mgr_ref[:], mr_ref[:],
            dt=dt, pendulum=pendulum)

        nd = jnp.concatenate(
            [pll.so3_log(pll.matmul3(pll.transpose(R_nn), fqR_n)),
             fxi_n - xi_nn], axis=0)
        Fx, fu2 = so3_stage_jacobian(
            R_new, xi_new, u_new, Jl_ref[:], Jil_ref[:], mgr_ref[:],
            mr_ref[:], dt=dt, pendulum=pendulum)
        nlx, nlxx, nl = so3_stage_cost_quad(
            R_new, xi_new, RbiR_ref[t], xib_ref[t], W1_ref[:], W2_ref[:],
            W1_ref[:], W2_ref[:])

        oR_ref[t] = R_nn
        oxi_ref[t] = xi_nn
        ou_ref[t] = u_new
        nfqR_ref[t] = fqR_n
        nfxi_ref[t] = fxi_n
        nd_ref[t] = nd
        nFx_ref[t] = Fx
        nfu2_ref[t] = fu2
        nlx_ref[t] = nlx
        nlxx_ref[t] = nlxx
        nl_ref[t] = nl[None, :]
        R_new, xi_new = R_nn, xi_nn
    R_s[:] = R_new
    xi_s[:] = xi_new


class SO3PipelineState(NamedTuple):
    qs: jnp.ndarray    # (B, N+1, 3, 3)
    xis: jnp.ndarray   # (B, N+1, 3)
    us: jnp.ndarray    # (B, N, 3)
    J_opt: jnp.ndarray
    grad_norm: jnp.ndarray


class SO3PipelineSolver:
    """End-to-end lane-layout MS-iLQR for SO(3) attitude / 3-D pendulum:
    2 kernels/iteration (Riccati backward; rollout fused with the next
    linearization) at a fixed iteration budget, mu = 0 — the
    MPC/throughput configuration, iterate-identical to
    `FastBatchSolver(use_pallas=False)` (tests/test_pipeline_so3.py)."""

    def __init__(self, N: int, iterations: int, dt: float,
                 pendulum: bool = False, term_quirk: bool = True,
                 interpret: bool = False, batch_tile: int = None,
                 stage_chunk: int = 1, sublanes: int = 1):
        """``sublanes``: the round-5 sublane-packed batch layout (see
        `PallasPipelineSolver` — same semantics, same bit-identical
        iterates; batch_tile must be >= 1024 on real hardware so the
        packed lane axis fills 128)."""
        self.N = N
        self.iterations = iterations
        self.dt = float(dt)
        self.pendulum = pendulum
        self.term_quirk = term_quirk
        self.interpret = interpret
        self.batch_tile = batch_tile
        if sublanes not in (1, 8):
            raise ValueError(f"sublanes must be 1 or 8, got {sublanes}")
        self.S = sublanes
        if N % stage_chunk:
            raise ValueError(f"horizon {N} not divisible by stage_chunk "
                             f"{stage_chunk}")
        self.stage_chunk = stage_chunk
        self._solve_jit = jax.jit(self._solve)

    # batch packing / layout-generic BlockSpecs shared with the SE(3)
    # pipeline (same self.{S, batch_tile, _tiles} contract)
    _tiles = PallasPipelineSolver._tiles
    _pack = PallasPipelineSolver._pack
    _unpack = PallasPipelineSolver._unpack
    _bshape = PallasPipelineSolver._bshape
    _gspec = PallasPipelineSolver._gspec
    _cspec = PallasPipelineSolver._cspec

    def _specs(self, B):
        nb, bt = self._tiles(B)
        ck = self.stage_chunk
        spec = lambda a: self._gspec(a, bt, ck)
        cspec = lambda a: self._cspec(a, bt)
        return nb, bt, ck, spec, cspec

    def _linearize_lane(self, qR, xi, us, refs, consts):
        N = self.N
        dtp = us.dtype
        nbd = 1 if self.S == 1 else 2
        B = int(np.prod(us.shape[-nbd:]))
        nb, bt, ck, spec, cspec = self._specs(B)
        bsh = self._bshape(B)
        args = [qR[:-1], qR[1:], xi[:-1], xi[1:], us,
                refs["RbiR"], refs["xib"]]
        cs = [consts["Jl"], consts["Jil"], consts["W1"], consts["W2"],
              consts["mgr"], consts["mr"]]
        in_specs = [spec(a) for a in args] + [cspec(a) for a in cs]
        out_shapes = (
            jax.ShapeDtypeStruct((N, 3, 3) + bsh, dtp),   # fqR
            jax.ShapeDtypeStruct((N, 3) + bsh, dtp),      # fxi
            jax.ShapeDtypeStruct((N, 6) + bsh, dtp),      # d
            jax.ShapeDtypeStruct((N, 6, 6) + bsh, dtp),   # Fx
            jax.ShapeDtypeStruct((N, 3, 3) + bsh, dtp),   # fu2
            jax.ShapeDtypeStruct((N, 6) + bsh, dtp),      # lx
            jax.ShapeDtypeStruct((N, 6, 6) + bsh, dtp),   # lxx
            jax.ShapeDtypeStruct((N, 1) + bsh, dtp),      # l
        )
        out_specs = tuple(spec(s) for s in out_shapes)
        kernel = functools.partial(_linearize_kernel_so3, dt=self.dt,
                                   pendulum=self.pendulum, chunk=ck)
        fqR, fxi, d, Fx, fu2, lx, lxx, l = pl.pallas_call(
            kernel, grid=(nb, N // ck), out_shape=out_shapes,
            in_specs=in_specs, out_specs=out_specs, interpret=self.interpret,
            compiler_params=None if self.interpret else _DIMSEM_PAR,
        )(*args, *cs)
        return dict(fqR=fqR, fxi=fxi, d=d, Fx=Fx, fu2=fu2, lx=lx, lxx=lxx,
                    l=l)

    def _backward_lane(self, lin, lu, term, consts):
        N = self.N
        dtp = lu.dtype
        nbd = 1 if self.S == 1 else 2
        B = int(np.prod(lu.shape[-nbd:]))
        nb, bt, ck, _, cspec = self._specs(B)
        nc = N // ck
        bsh = self._bshape(B)
        tsh = self._bshape(bt)
        spec = lambda a: self._gspec(a, bt, ck, nc=nc)

        ins = [lin["Fx"], lin["fu2"], lin["d"], lin["lx"], lu, lin["lxx"]]
        in_specs = [spec(a) for a in ins] + [cspec(a) for a in term] + \
            [cspec(consts["Luu"])]
        out_shapes = (
            jax.ShapeDtypeStruct((N, NU) + bsh, dtp),
            jax.ShapeDtypeStruct((N, NU, NX) + bsh, dtp),
            jax.ShapeDtypeStruct((N, NU) + bsh, dtp),
            jax.ShapeDtypeStruct((1, 1) + bsh, dtp),
        )
        out_specs = tuple(spec(s) for s in out_shapes[:3]) + \
            (cspec(out_shapes[3]),)
        k, K, gvec, lN = pl.pallas_call(
            functools.partial(_riccati_kernel_so3, chunk=ck,
                              pendulum=self.pendulum),
            grid=(nb, nc), out_shape=out_shapes,
            in_specs=in_specs, out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((NX,) + tsh, dtp),
                            pltpu.VMEM((NX, NX) + tsh, dtp)],
            interpret=self.interpret,
            compiler_params=None if self.interpret else _DIMSEM,
        )(*ins, *term, consts["Luu"])
        return k, K, gvec, lN[0, 0]

    def _rollout_linearize_lane(self, qR, xi, us, k, K, lin, refs, consts):
        N = self.N
        dtp = us.dtype
        nbd = 1 if self.S == 1 else 2
        B = int(np.prod(us.shape[-nbd:]))
        nb, bt, ck, spec, cspec = self._specs(B)
        bsh = self._bshape(B)
        tsh = self._bshape(bt)
        ins = [qR[:-1], qR[1:], xi[:-1], xi[1:], us, k, K,
               lin["d"], lin["fqR"], lin["fxi"], refs["RbiR"], refs["xib"]]
        cs = [consts["Jl"], consts["Jil"], consts["W1"], consts["W2"],
              consts["mgr"], consts["mr"]]
        in_specs = [spec(a) for a in ins] + [cspec(a) for a in cs]
        out_shapes = (
            jax.ShapeDtypeStruct((N, 3, 3) + bsh, dtp),   # oR
            jax.ShapeDtypeStruct((N, 3) + bsh, dtp),      # oxi
            jax.ShapeDtypeStruct((N, 3) + bsh, dtp),      # ou
            jax.ShapeDtypeStruct((N, 3, 3) + bsh, dtp),   # nfqR
            jax.ShapeDtypeStruct((N, 3) + bsh, dtp),      # nfxi
            jax.ShapeDtypeStruct((N, 6) + bsh, dtp),      # nd
            jax.ShapeDtypeStruct((N, 6, 6) + bsh, dtp),   # nFx
            jax.ShapeDtypeStruct((N, 3, 3) + bsh, dtp),   # nfu2
            jax.ShapeDtypeStruct((N, 6) + bsh, dtp),      # nlx
            jax.ShapeDtypeStruct((N, 6, 6) + bsh, dtp),   # nlxx
            jax.ShapeDtypeStruct((N, 1) + bsh, dtp),      # nl
        )
        out_specs = tuple(spec(s) for s in out_shapes)
        kernel = functools.partial(_rollout_linearize_kernel_so3, dt=self.dt,
                                   pendulum=self.pendulum, chunk=ck)
        (oR, oxi, ou, nfqR, nfxi, nd, nFx, nfu2, nlx, nlxx,
         nl) = pl.pallas_call(
            kernel, grid=(nb, N // ck), out_shape=out_shapes,
            in_specs=in_specs, out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((3, 3) + tsh, dtp),
                            pltpu.VMEM((3,) + tsh, dtp)],
            interpret=self.interpret,
            compiler_params=None if self.interpret else _DIMSEM,
        )(*ins, *cs)
        qR_new = jnp.concatenate([qR[:1], oR], axis=0)
        xi_new = jnp.concatenate([xi[:1], oxi], axis=0)
        new_lin = dict(fqR=nfqR, fxi=nfxi, d=nd, Fx=nFx, fu2=nfu2, lx=nlx,
                       lxx=nlxx, l=nl)
        return qR_new, xi_new, ou, new_lin

    # ----------------------------------------------------------------------

    def _prepare(self, dyn, cost, q0s, xi0s, us0):
        B = q0s.shape[0]
        N = self.N
        dtp = us0.dtype
        lanes = lambda M: jnp.broadcast_to(
            jnp.asarray(M, dtp)[..., None], jnp.asarray(M).shape + (B,))
        if self.pendulum:
            rho = (dyn.l / 2.0) * jnp.asarray([0.0, 0.0, -1.0], dtp)
            mgr = lanes(dyn.m * dyn.g * rho)
            mr = lanes(dyn.m * rho)
        else:
            mgr = lanes(jnp.zeros(3, dtp))
            mr = lanes(jnp.zeros(3, dtp))
        consts = dict(
            Jl=lanes(dyn.J), Jil=lanes(dyn.Jinv),
            W1=lanes(cost.Q1), W2=lanes(cost.Q2),
            Luu=lanes(2.0 * cost.R), mgr=mgr, mr=mr,
        )
        ref = lambda x: jnp.moveaxis(
            jnp.broadcast_to(x[:, None], (x.shape[0], B) + x.shape[1:]),
            1, -1)
        refs = dict(
            RbiR=ref(cost.q_ref_inv[:-1]),
            xib=ref(cost.xi_ref[:-1]),
        )
        q_ref_b = jnp.broadcast_to(cost.q_ref[1:][:, None], (N, B, 3, 3))
        qR = jnp.concatenate([jnp.moveaxis(q0s[None], 1, -1),
                              jnp.moveaxis(q_ref_b, 1, -1)], axis=0)
        xi_ref_b = jnp.broadcast_to(cost.xi_ref[1:][:, None], (N, B, 3))
        xi = jnp.concatenate([jnp.moveaxis(xi0s[None], 1, -1),
                              jnp.moveaxis(xi_ref_b, 1, -1)], axis=0)
        us = jnp.moveaxis(us0, 0, -1)
        return qR, xi, us, refs, consts

    def _solve(self, dyn, cost, q0s, xi0s, us0):
        B = q0s.shape[0]
        N = self.N
        dtp = us0.dtype
        pk = self._pack
        bsh = self._bshape(B)
        qR, xi, us, refs, consts = self._prepare(dyn, cost, q0s, xi0s, us0)
        if self.S > 1:
            qR, xi, us = pk(qR), pk(xi), pk(us)
            refs = {k_: pk(v) for k_, v in refs.items()}
            consts = {k_: pk(v) for k_, v in consts.items()}
        lanes = lambda M: pk(jnp.broadcast_to(
            jnp.asarray(M, dtp)[..., None], jnp.asarray(M).shape + (B,)))
        ref = lambda x: pk(jnp.moveaxis(
            jnp.broadcast_to(x[:, None], (x.shape[0], B) + x.shape[1:]),
            1, -1))
        RbiR_N = ref(cost.q_ref_inv[-1:])[0]
        xib_N = ref(cost.xi_ref[-1:])[0]
        # terminal quirk: value+gradient weights Q, Hessian weights P
        W1vN = lanes(cost.Q1 if self.term_quirk else cost.P1)
        W2vN = lanes(cost.Q2 if self.term_quirk else cost.P2)
        W1hN = lanes(cost.P1)
        W2hN = lanes(cost.P2)

        def backward_metrics(qR, xi, us, lin):
            lu = 2.0 * jnp.einsum("ij,nj...->ni...", cost.R.astype(dtp), us)
            term = (qR[-1], xi[-1], RbiR_N, xib_N, W1vN, W2vN, W1hN, W2hN)
            k, K, gvec, lN = self._backward_lane(lin, lu, term, consts)
            g = jnp.mean(jnp.sqrt(jnp.sum(gvec * gvec, axis=1)), axis=0)
            J = jnp.sum(lin["l"][:, 0], axis=0) + \
                jnp.einsum("ni...,ij,nj...->...", us, cost.R.astype(dtp),
                           us) + lN
            return k, K, J, g

        def body(_, carry):
            qR, xi, us, lin, J, g = carry
            k, K, J, g = backward_metrics(qR, xi, us, lin)
            qR, xi, us, lin = self._rollout_linearize_lane(
                qR, xi, us, k, K, lin, refs, consts)
            return qR, xi, us, lin, J, g

        lin0 = self._linearize_lane(qR, xi, us, refs, consts)
        init = (qR, xi, us, lin0, jnp.full(bsh, jnp.inf, dtp),
                jnp.full(bsh, jnp.inf, dtp))
        qR, xi, us, _, J, g = lax.fori_loop(0, self.iterations, body, init)

        upk = self._unpack
        bk = lambda x: jnp.moveaxis(upk(x), -1, 0)
        return SO3PipelineState(qs=bk(qR), xis=bk(xi), us=bk(us),
                                J_opt=upk(J) if self.S > 1 else J,
                                grad_norm=upk(g) if self.S > 1 else g)

    def solve(self, dyn, cost, q0s, xi0s, us0):
        return self._solve_jit(dyn, cost, jnp.asarray(q0s),
                               jnp.asarray(xi0s), jnp.asarray(us0))
