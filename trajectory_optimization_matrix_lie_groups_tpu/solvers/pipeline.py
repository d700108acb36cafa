"""Fully lane-layout Pallas MS-iLQR pipeline (fastest path).

`FastBatchSolver` with the three kernels still pays per-iteration layout
conversions: each kernel wants (stage, ..., B) "lane layout" while the
solver state lives in (B, stage, ...) — moveaxis copies of the 29 MB
Jacobian/Hessian tensors every call.  This solver keeps EVERYTHING in lane
layout across the whole solve: the rollout kernel's outputs feed the
linearizer feeds the Riccati kernel with no transposes; conversion happens
once at entry/exit.

Further specializations vs the generic kernels:
  - Fu and Luu are constants for the SE(3) free body + GN tracking cost
    (Lux = 0): the Riccati kernel takes them as single non-gridded VMEM
    inputs instead of (N, ...) arrays;
  - Exp(d_q) and f(x)^-1 are computed in-kernel by the rollout (no XLA
    pre-pass).

Scope: se3_dynamics + GN tracking cost, fixed iteration budget, mu = 0 —
the MPC/throughput configuration (same iterates as FastBatchSolver; see
tests/test_pipeline.py).
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trajectory_optimization_matrix_lie_groups_tpu.ops import dfx
from trajectory_optimization_matrix_lie_groups_tpu.ops import pallas_lie as pll
from trajectory_optimization_matrix_lie_groups_tpu.ops.pallas_linearize import (
    _linearize_kernel,
    stage_cost_quad,
    stage_dynamics_eval,
    stage_jacobian,
)

NX, NU = 12, 6

# The (batch_tiles, stages) grid: batch tiles are independent ("parallel" —
# Mosaic may split them across the chip's TensorCores), the stage dim
# carries the VMEM recursion state ("arbitrary" = sequential).  The carry
# scratch is re-initialized at stage 0 of every tile, so a core picking up
# any subset of tiles is correct.
_DIMSEM = pltpu.CompilerParams(
    dimension_semantics=("parallel", "arbitrary"))
# The linearizer has no cross-stage carry (stage work is independent), so
# both grid dims are parallel.
_DIMSEM_PAR = pltpu.CompilerParams(
    dimension_semantics=("parallel", "parallel"))


def _cross(a, b):
    return pll._vec([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


# -- Riccati backward, const-Fu/Luu specialization ---------------------------

def chol_factor_lane(Quu, nu):
    """Lane-batched nu x nu Cholesky (unrolled); DF-polymorphic.

    The DIAGONAL IS STORED AS ITS RECIPROCAL (L[j][j] = 1/sqrt(pivot)):
    the factorization computes that reciprocal anyway for the column
    scaling, and `chol_solve_lane` then multiplies instead of dividing —
    the two triangular solves hit the diagonal 2*nu*p times per stage and
    a VPU divide costs several multiplies.  Only the pivot updates read
    L entries, and those touch off-diagonals exclusively."""
    L = [[None] * nu for _ in range(nu)]
    for j in range(nu):
        sv = Quu[j, j, :]
        for kk in range(j):
            sv = sv - L[j][kk] * L[j][kk]
        inv = 1.0 / dfx.sqrt(sv)
        L[j][j] = inv
        for i2 in range(j + 1, nu):
            sv = Quu[i2, j, :]
            for kk in range(j):
                sv = sv - L[i2][kk] * L[j][kk]
            L[i2][j] = sv * inv
    return L


def chol_solve_lane(L, Bm, nu):
    """Solve (L L^T) X = Bm for lane-layout Bm (nu, p, B); DF-polymorphic.
    ``L`` from `chol_factor_lane` (diagonal stored as reciprocal)."""
    Y = [None] * nu
    for i2 in range(nu):
        sv = Bm[i2]
        for kk in range(i2):
            sv = sv - L[i2][kk][None, :] * Y[kk]
        Y[i2] = sv * L[i2][i2][None, :]
    X = [None] * nu
    for i2 in reversed(range(nu)):
        sv = Y[i2]
        for kk in range(i2 + 1, nu):
            sv = sv - L[kk][i2][None, :] * X[kk]
        X[i2] = sv * L[i2][i2][None, :]
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (nu,) + (1,) * (len(Bm.shape) - 1), 0)
    if dfx.is_df(Bm):
        # row placement into the output is plain masking — assemble the hi
        # and lo planes without DF arithmetic
        Xp = [dfx.promote(x) for x in X]
        out_hi = jnp.zeros_like(Bm.hi)
        out_lo = jnp.zeros_like(Bm.lo)
        for i2 in range(nu):
            oh = (rows == i2).astype(Bm.dtype)
            out_hi = out_hi + oh * Xp[i2].hi[None]
            out_lo = out_lo + oh * Xp[i2].lo[None]
        return dfx.DF(out_hi, out_lo)
    out = jnp.zeros_like(Bm)
    for i2 in range(nu):
        out = out + (rows == i2).astype(Bm.dtype) * X[i2][None]
    return out


def riccati_stage(fx, dd, lx_t, lu_t, lxx_t, fu2, fu2T, Luu, Vx, Vxx,
                  *, nu, glow, half=6, luual_t=None):
    """One defect-aware Riccati step on lane-layout values; DF-polymorphic.

    Math per `solvers/lie_ilqr.py` / the reference's MS backward pass
    (traopt_controller.py:1741-1748), exploiting the Lie-family block
    structure: Fu = [0; fu2] (fu2 = bottom ``half`` rows — constant for the
    SE(3) free body, per-stage for the 3-D pendulum), Lux = 0, and
    Fx = [[A, Bb], [C, D]] with C = 0 unless ``glow`` (the gravity J_xi_q /
    pendulum L block).  ``half`` is the pose-block dimension: 6 for SE(3)
    (nx = 12), 3 for the SO(3) family (nx = 6).
    Returns (k, K, Qu, Vx_new, Vxx_new)."""
    h = half
    nx = 2 * h
    A, Bb, D = fx[:h, :h], fx[:h, h:], fx[h:, h:]
    AT, BbT, DT = pll.transpose(A), pll.transpose(Bb), pll.transpose(D)

    Vmod = Vx + pll.matvec(Vxx, dd, nx)
    Qx_top = pll.matvec(AT, Vmod[:h], h)
    Qx_bot = pll.matvec(BbT, Vmod[:h], h) + pll.matvec(DT, Vmod[h:], h)
    VF_l = pll.matmul(Vxx[:, :h], A, h)
    VF_r = pll.matmul(Vxx[:, :h], Bb, h) + pll.matmul(Vxx[:, h:], D, h)
    if glow:
        C = fx[h:, :h]
        CT = pll.transpose(C)
        Qx_top = Qx_top + pll.matvec(CT, Vmod[h:], h)
        VF_l = VF_l + pll.matmul(Vxx[:, h:], C, h)
    Qx = lx_t + dfx.concatenate([Qx_top, Qx_bot], axis=0)
    Qu = lu_t + pll.matvec(fu2T, Vmod[h:], h)
    VF = dfx.concatenate([VF_l, VF_r], axis=1)
    Qxx_top = pll.matmul(AT, VF[:h], h)
    if glow:
        Qxx_top = Qxx_top + pll.matmul(CT, VF[h:], h)
    Qxx_bot = pll.matmul(BbT, VF[:h], h) + pll.matmul(DT, VF[h:], h)
    Qxx = lxx_t + dfx.concatenate([Qxx_top, Qxx_bot], axis=0)
    Qux = pll.matmul(fu2T, VF[h:], h)                   # Lux = 0
    Quu = Luu + pll.matmul(fu2T,
                           pll.matmul(Vxx[h:, h:], fu2, h), h)
    if luual_t is not None:
        # diagonal AL penalty add via a one-hot mask (Mosaic: no scatter)
        nb1 = (1,) * (len(Quu.shape) - 2)
        r_i = jax.lax.broadcasted_iota(jnp.int32, (nu, nu) + nb1, 0)
        c_i = jax.lax.broadcasted_iota(jnp.int32, (nu, nu) + nb1, 1)
        eye = (r_i == c_i).astype(Quu.dtype)
        Quu = Quu + eye * luual_t[:, None]

    L = chol_factor_lane(Quu, nu)
    K = -chol_solve_lane(L, Qux, nu)
    k = -chol_solve_lane(L, Qu[:, None, :], nu)[:, 0, :]

    KT = pll.transpose(K)
    QuxT = pll.transpose(Qux)
    KTQuu = pll.matmul(KT, Quu, nu)
    Vx_new = (Qx + pll.matvec(KTQuu, k, nu) + pll.matvec(KT, Qu, nu)
              + pll.matvec(QuxT, k, nu))
    # KT Qux + QuxT K = M + M^T exactly (transpose of a product), so
    # one matmul + the symmetrized (Qxx + KTQuu K) term gives the same
    # symmetrized V_xx as the 3-matmul form
    M = pll.matmul(KT, Qux, nu)
    S = Qxx + pll.matmul(KTQuu, K, nu)
    Vxx_new = 0.5 * (S + pll.transpose(S)) + M + pll.transpose(M)
    return k, K, Qu, Vx_new, Vxx_new


def _riccati_kernel_const(Fx_ref, d_ref, lx_ref, lu_ref, lxx_ref,
                          *rest, nu=NU, chunk=1, glow=False, al=False):
    # ``al``: one extra gridded input (N, nu, B) of per-stage diagonal Quu
    # additions — the input-box AL penalty gu^T Imu gu (solvers/al_fast.py);
    # the matching lu additions ride in lu_ref (added as XLA glue).
    if al:
        (luual_ref, qRN_ref, qpN_ref, xiN_ref, RbiRN_ref, RbipN_ref,
         AdbN_ref, xibN_ref, W1N_ref, W2N_ref, Fu_ref, Luu_ref,
         k_ref, K_ref, gvec_ref, lN_ref, Vx_s, Vxx_s) = rest
    else:
        luual_ref = None
        (qRN_ref, qpN_ref, xiN_ref, RbiRN_ref, RbipN_ref,
         AdbN_ref, xibN_ref, W1N_ref, W2N_ref, Fu_ref, Luu_ref,
         k_ref, K_ref, gvec_ref, lN_ref, Vx_s, Vxx_s) = rest
    # grid = (batch_tiles, N // chunk): the stage recursion rides dim 1 and
    # each grid step processes ``chunk`` stages from one VMEM block (fewer,
    # larger HBM<->VMEM transfers + less per-step grid overhead); a fresh
    # batch tile re-initializes the value-function carry from the terminal
    # quadratization, computed in-kernel (its ~100 tiny lane ops cost
    # milliseconds per iteration as unfused XLA glue).
    @pl.when(pl.program_id(1) == 0)
    def _init():
        lxN, lxxN, lN = stage_cost_quad(
            qRN_ref[:], qpN_ref[:], xiN_ref[:], RbiRN_ref[:], RbipN_ref[:],
            AdbN_ref[:], xibN_ref[:], W1N_ref[:], W2N_ref[:])
        Vx_s[:] = lxN
        Vxx_s[:] = lxxN
        lN_ref[0] = lN[None]

    # Block structure exploited throughout (~35% fewer lane multiplies than
    # generic 12-d products): Fu = [0; Jinv Pu dt] (top half zero), and
    # Fx = [[A, Bb], [C, D]] with C = 0 for the free-body family (``glow``
    # adds the gravity J_xi_q block, models/dynamics.py:1130).
    fu2 = Fu_ref[:][6:]
    fu2T = pll.transpose(fu2)
    Luu = Luu_ref[:]
    Vx = Vx_s[:]
    Vxx = Vxx_s[:]
    for t in reversed(range(chunk)):
        k, K, Qu, Vx, Vxx = riccati_stage(
            Fx_ref[t], d_ref[t], lx_ref[t], lu_ref[t], lxx_ref[t],
            fu2, fu2T, Luu, Vx, Vxx, nu=nu, glow=glow,
            luual_t=None if luual_ref is None else luual_ref[t])
        k_ref[t] = k
        K_ref[t] = K
        # per-stage MS gradient Qu = lu + Fu^T (V_x[t+1] + V_xx[t+1] d[t])
        # emitted in-kernel so the (N,12,12,B) value tensor never touches HBM
        gvec_ref[t] = Qu
    Vx_s[:] = Vx
    Vxx_s[:] = Vxx


# -- rollout, lane-native with in-kernel Exp(d)/f^-1 -------------------------

def rollout_stage(R_new, p_new, xi_new, qR_t, qp_t, qRn_t, qpn_t, xi_t,
                  xin_t, u_t, k_t, K_t, d_t, fqR_t, fqp_t, fxi_t,
                  Jl, Jil, Pu, mg, *, dt, gravity):
    """One gap-closing rollout step on lane-layout values; DF-polymorphic.

    Mirrors the reference's MS forward pass (traopt_controller.py:2697-2726):
    feedback on the tangent-space deviation from the nominal, then the
    group composition x+ = x_next Exp(d) f(xbar)^-1 f(x_new).
    Returns (R_nn, p_nn, xi_nn, u_new, fqR_n, fqp_n, fxi_new)."""
    Ri_inv, pi_inv = pll.se3_inverse(qR_t, qp_t)
    Re, pe = pll.se3_compose(Ri_inv, pi_inv, R_new, p_new)
    xs_err = dfx.concatenate(
        [pll.se3_log(Re, pe), xi_new - xi_t], axis=0)

    u_new = u_t + k_t + sum(
        K_t[:, j, :] * xs_err[j:j + 1, :] for j in range(NX))

    fqR_n, fqp_n, fxi_new = stage_dynamics_eval(
        R_new, p_new, xi_new, u_new, Jl, Jil, Pu, mg,
        dt=dt, gravity=gravity)

    edR, edp = pll.se3_exp(d_t[:6])
    fiR, fip = pll.se3_inverse(fqR_t, fqp_t)
    R_a, p_a = pll.se3_compose(qRn_t, qpn_t, edR, edp)
    R_b, p_b = pll.se3_compose(R_a, p_a, fiR, fip)
    R_nn, p_nn = pll.se3_compose(R_b, p_b, fqR_n, fqp_n)
    R_nn = pll.so3_normalize(R_nn)
    xi_nn = xin_t + fxi_new - fxi_t + d_t[6:]
    return R_nn, p_nn, xi_nn, u_new, fqR_n, fqp_n, fxi_new


def _rollout_kernel_lane(qR_ref, qp_ref, qRn_ref, qpn_ref, xi_ref, xin_ref,
                         u_ref, k_ref, K_ref, d_ref, fqR_ref, fqp_ref,
                         fxi_ref, Jl_ref, Jil_ref, Pu_ref, mg_ref,
                         oR_ref, op_ref, oxi_ref, ou_ref,
                         R_s, p_s, xi_s, *, dt, gravity=False, chunk=1):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        R_s[:] = qR_ref[0]
        p_s[:] = qp_ref[0]
        xi_s[:] = xi_ref[0]

    R_new, p_new, xi_new = R_s[:], p_s[:], xi_s[:]
    for t in range(chunk):
        R_nn, p_nn, xi_nn, u_new, _, _, _ = rollout_stage(
            R_new, p_new, xi_new, qR_ref[t], qp_ref[t], qRn_ref[t],
            qpn_ref[t], xi_ref[t], xin_ref[t], u_ref[t], k_ref[t], K_ref[t],
            d_ref[t], fqR_ref[t], fqp_ref[t], fxi_ref[t],
            Jl_ref[:], Jil_ref[:], Pu_ref[:], mg_ref, dt=dt, gravity=gravity)
        oR_ref[t] = R_nn
        op_ref[t] = p_nn
        oxi_ref[t] = xi_nn
        ou_ref[t] = u_new
        R_new, p_new, xi_new = R_nn, p_nn, xi_nn
    R_s[:] = R_new
    p_s[:] = p_new
    xi_s[:] = xi_new


# -- fused rollout + next-iteration linearization -----------------------------

def _rollout_linearize_kernel(
        qR_ref, qp_ref, qRn_ref, qpn_ref, xi_ref, xin_ref, u_ref,
        k_ref, K_ref, d_ref, fqR_ref, fqp_ref, fxi_ref,
        RbiR_ref, Rbip_ref, Adb_ref, xib_ref,
        Jl_ref, Jil_ref, W1_ref, W2_ref, Pu_ref, mg_ref,
        oR_ref, op_ref, oxi_ref, ou_ref,
        nfqR_ref, nfqp_ref, nfxi_ref, nd_ref, nFx_ref, nlx_ref,
        nlxx_ref, nl_ref,
        R_s, p_s, xi_s,
        *, dt, gravity=False, exact_grav=False, chunk=1):
    """Gap-closing rollout of stage t fused with the linearization of stage
    t of the NEW trajectory: the rollout's dynamics evaluation at the new
    (x_t, u_t) IS the linearizer's, and the freshly produced x_{t+1} closes
    the defect — so the next iteration's linearize pass (its own N-step grid
    sweep + re-reading the trajectory from HBM) disappears entirely.
    Outputs: the new trajectory/controls plus the full stage linearization
    (nfq*, nfxi, nd, nFx, nlx, nlxx, nl) consumed by the next backward."""
    @pl.when(pl.program_id(1) == 0)
    def _init():
        R_s[:] = qR_ref[0]
        p_s[:] = qp_ref[0]
        xi_s[:] = xi_ref[0]

    R_new, p_new, xi_new = R_s[:], p_s[:], xi_s[:]
    for t in range(chunk):
        # ---- rollout step t (same math as _rollout_kernel_lane) ---------
        R_nn, p_nn, xi_nn, u_new, fqR_n, fqp_n, fxi_new = rollout_stage(
            R_new, p_new, xi_new, qR_ref[t], qp_ref[t], qRn_ref[t],
            qpn_ref[t], xi_ref[t], xin_ref[t], u_ref[t], k_ref[t], K_ref[t],
            d_ref[t], fqR_ref[t], fqp_ref[t], fxi_ref[t],
            Jl_ref[:], Jil_ref[:], Pu_ref[:], mg_ref, dt=dt, gravity=gravity)

        # ---- linearize stage t of the NEW trajectory --------------------
        # dynamics eval (fqR_n, fqp_n, fxi_new) reused from the rollout;
        # defect against the gap-closed x_{t+1}
        Rni, pni = pll.se3_inverse(R_nn, p_nn)
        Rd, pd = pll.se3_compose(Rni, pni, fqR_n, fqp_n)
        nd = dfx.concatenate([pll.se3_log(Rd, pd), fxi_new - xi_nn], axis=0)
        Fx = stage_jacobian(R_new, xi_new, Jl_ref[:], Jil_ref[:], mg_ref,
                            dt=dt, gravity=gravity, exact_grav=exact_grav)
        nlx, nlxx, nl = stage_cost_quad(
            R_new, p_new, xi_new, RbiR_ref[t], Rbip_ref[t], Adb_ref[t],
            xib_ref[t], W1_ref[:], W2_ref[:])

        oR_ref[t] = R_nn
        op_ref[t] = p_nn
        oxi_ref[t] = xi_nn
        ou_ref[t] = u_new
        nfqR_ref[t] = fqR_n
        nfqp_ref[t] = fqp_n
        nfxi_ref[t] = fxi_new
        nd_ref[t] = nd
        nFx_ref[t] = Fx
        nlx_ref[t] = nlx
        nlxx_ref[t] = nlxx
        nl_ref[t] = nl[None, :]
        R_new, p_new, xi_new = R_nn, p_nn, xi_nn
    R_s[:] = R_new
    p_s[:] = p_new
    xi_s[:] = xi_new


class PipelineState(NamedTuple):
    qs: jnp.ndarray    # (B, N+1, 4, 4)
    xis: jnp.ndarray
    us: jnp.ndarray
    J_opt: jnp.ndarray
    grad_norm: jnp.ndarray


class PallasPipelineSolver:
    """End-to-end lane-layout MS-iLQR: 2 kernels/iteration by default
    (Riccati backward; rollout fused with the next linearization), or
    the 3-kernel linearize/backward/rollout layout with fused=False."""

    def __init__(self, N: int, iterations: int, dt: float,
                 interpret: bool = False, batch_tile: int = None,
                 gravity: bool = False, exact_gravity_jacobian: bool = False,
                 stage_chunk: int = 1, fused: bool = True,
                 sublanes: int = 1):
        """``batch_tile`` (divides B): lanes per kernel grid step.  Kernels
        run on a (B // batch_tile, N) grid so VMEM holds one tile's blocks
        instead of the whole batch — required for B > ~512 at f32.

        ``gravity`` (static) selects the rigid-body/drone dynamics family:
        pass `RigidBodyParams` as ``dyn`` (its Pu projection sets nu);
        ``exact_gravity_jacobian`` matches the flag in models/dynamics.py.

        ``stage_chunk`` (divides N): stages processed per kernel grid step —
        larger chunks amortize per-step grid overhead and HBM<->VMEM transfer
        latency at the cost of ``chunk``x VMEM blocks and kernel-body
        unrolling (compile time).

        ``fused``: run each iteration's rollout fused with the NEXT
        iteration's stage linearization (one combined kernel; the rollout's
        dynamics eval is the linearizer's) — 2 kernels per iteration instead
        of 3.  Iterates are identical; set False for the 3-kernel layout.

        ``sublanes`` (S, 1 or 8): S > 1 packs the batch over BOTH vreg axes
        — arrays carry trailing (S, bt/S) instead of (bt,), so every VPU op
        in the kernels is a dense (8, 128) vreg instead of a (d, bt) slice
        at d/8 sublane utilization (d = 1..12 for this stage math).  The
        round-5 answer to the 21%-of-HBM-roofline finding (records
        name=roofline_f32_df): the pipeline is VPU-issue-bound, and sublane
        packing raises per-instruction density ~8x on the scalar-slice
        chains (Cholesky) and ~1.3x on row ops.  Iterates are identical to
        the lane layout (same math, same order) up to batch permutation:
        batch element b maps to (s, l) = divmod-by-(bt/S) WITHIN each tile."""
        self.N = N
        self.iterations = iterations
        self.dt = float(dt)
        self.interpret = interpret
        self.batch_tile = batch_tile
        self.fused = fused
        self.gravity = gravity
        self.exact_grav = exact_gravity_jacobian
        if sublanes not in (1, 8):
            raise ValueError(f"sublanes must be 1 or 8, got {sublanes}")
        self.S = sublanes
        if N % stage_chunk:
            raise ValueError(f"horizon {N} not divisible by stage_chunk "
                             f"{stage_chunk}")
        self.stage_chunk = stage_chunk
        self._solve_jit = jax.jit(self._solve)

    def _tiles(self, B):
        bt = B if self.batch_tile is None else self.batch_tile
        if B % bt:
            raise ValueError(f"batch {B} not divisible by batch_tile {bt}")
        if bt % self.S:
            raise ValueError(f"batch_tile {bt} not divisible by sublanes "
                             f"{self.S}")
        return B // bt, bt

    # batch packing: (..., B) <-> (..., S, B // S).  Within a lane tile the
    # batch is laid out tile-major: global element b of tile k sits at
    # (s, l) = divmod(b, bt // S) of that tile's (S, btL) block, so the HBM
    # array is (..., S, nb * btL) with tiles contiguous per sublane row.
    def _pack(self, x):
        if self.S == 1:
            return x
        B = x.shape[-1]
        nb, bt = self._tiles(B)
        btL = bt // self.S
        y = x.reshape(x.shape[:-1] + (nb, self.S, btL))
        y = jnp.swapaxes(y, -3, -2)  # (..., S, nb, btL)
        return y.reshape(x.shape[:-1] + (self.S, nb * btL))

    def _unpack(self, x):
        if self.S == 1:
            return x
        L = x.shape[-1]
        btL = (self.batch_tile or (self.S * L)) // self.S
        nb = L // btL
        y = x.reshape(x.shape[:-2] + (self.S, nb, btL))
        y = jnp.swapaxes(y, -3, -2)  # (..., nb, S, btL)
        return y.reshape(x.shape[:-2] + (self.S * L,))

    # kernels operating purely in lane layout ------------------------------

    def _bshape(self, B):
        """Trailing batch dims of a kernel-side array holding B problems."""
        return (B,) if self.S == 1 else (self.S, B // self.S)

    def _gspec(self, a, bt, ck, nc=None):
        """Gridded spec: stage blocks of ``ck`` x one (S, bt/S) batch tile.
        ``nc``: if given, grid dim 1 walks stages in REVERSE (backward)."""
        S = self.S
        r = len(a.shape)
        st = (lambda i: i) if nc is None else (lambda i: nc - 1 - i)
        if S == 1:
            return pl.BlockSpec(
                (ck,) + a.shape[1:-1] + (bt,),
                lambda b, i, r=r: (st(i),) + (0,) * (r - 2) + (b,))
        return pl.BlockSpec(
            (ck,) + a.shape[1:-2] + (S, bt // S),
            lambda b, i, r=r: (st(i),) + (0,) * (r - 3) + (0, b))

    def _cspec(self, a, bt):
        """Non-gridded (constant / terminal) spec: one batch tile."""
        S = self.S
        r = len(a.shape)
        if S == 1:
            return pl.BlockSpec(a.shape[:-1] + (bt,),
                                lambda b, i, r=r: (0,) * (r - 1) + (b,))
        return pl.BlockSpec(a.shape[:-2] + (S, bt // S),
                            lambda b, i, r=r: (0,) * (r - 2) + (0, b))

    def _linearize_lane(self, qR, qp, xi, us, refs, consts):
        N = self.N
        dtp = us.dtype
        B = us.shape[-1] if self.S == 1 else us.shape[-2] * us.shape[-1]
        nb, bt = self._tiles(B)
        ck = self.stage_chunk
        bsh = self._bshape(B)
        args = dict(
            qR=qR[:-1], qp=qp[:-1], qRn=qR[1:], qpn=qp[1:],
            xi=xi[:-1], xin=xi[1:], u=us,
            RbiR=refs["RbiR"], Rbip=refs["Rbip"], Adb=refs["Adb"],
            xib=refs["xib"],
        )
        spec = lambda a: self._gspec(a, bt, ck)
        cspec = lambda a: self._cspec(a, bt)

        in_specs = [spec(a) for a in args.values()] + \
            [cspec(consts["Jl"]), cspec(consts["Jil"]),
             cspec(consts["W1"]), cspec(consts["W2"]),
             cspec(consts["Pu"]), cspec(consts["mg"])]
        out_shapes = (
            jax.ShapeDtypeStruct((N, 3, 3) + bsh, dtp),
            jax.ShapeDtypeStruct((N, 3) + bsh, dtp),
            jax.ShapeDtypeStruct((N, 6) + bsh, dtp),
            jax.ShapeDtypeStruct((N, 12) + bsh, dtp),
            jax.ShapeDtypeStruct((N, 12, 12) + bsh, dtp),
            jax.ShapeDtypeStruct((N, 12) + bsh, dtp),
            jax.ShapeDtypeStruct((N, 12, 12) + bsh, dtp),
            jax.ShapeDtypeStruct((N, 1) + bsh, dtp),
        )
        out_specs = tuple(spec(s) for s in out_shapes)
        kernel = functools.partial(_linearize_kernel, dt=self.dt,
                                   gravity=self.gravity,
                                   exact_grav=self.exact_grav, chunk=ck)
        fqR, fqp, fxi, d, Fx, lx, lxx, l = pl.pallas_call(
            kernel, grid=(nb, N // ck), out_shape=out_shapes, in_specs=in_specs,
            out_specs=out_specs, interpret=self.interpret,
            compiler_params=None if self.interpret else _DIMSEM_PAR,
        )(*args.values(), consts["Jl"], consts["Jil"], consts["W1"],
          consts["W2"], consts["Pu"], consts["mg"])
        return dict(fqR=fqR, fqp=fqp, fxi=fxi, d=d, Fx=Fx, lx=lx, lxx=lxx, l=l)

    def _backward_lane(self, lin, lu, term, consts, luu_al=None):
        """``term``: lane-layout terminal state + references, consumed by the
        in-kernel terminal quadratization at each batch tile's first grid
        step: (qRN, qpN, xiN, RbiRN, RbipN, AdbN, xibN, W1N, W2N).
        ``luu_al``: optional (N, nu, B) per-stage diagonal Quu additions
        (input-box AL penalty)."""
        N = self.N
        dtp = lu.dtype
        nbd = 1 if self.S == 1 else 2
        B = int(np.prod(lu.shape[-nbd:]))
        nu = lu.shape[-nbd - 1]
        nb, bt = self._tiles(B)
        ck = self.stage_chunk
        nc = N // ck
        bsh = self._bshape(B)
        tsh = self._bshape(bt)

        spec = lambda a: self._gspec(a, bt, ck, nc=nc)
        cspec = lambda a: self._cspec(a, bt)

        ins = [lin["Fx"], lin["d"], lin["lx"], lu, lin["lxx"]]
        if luu_al is not None:
            ins.append(luu_al)
        in_specs = [spec(a) for a in ins] + \
            [cspec(a) for a in term] + \
            [cspec(consts["Fu"]), cspec(consts["Luu"])]
        out_shapes = (
            jax.ShapeDtypeStruct((N, nu) + bsh, dtp),
            jax.ShapeDtypeStruct((N, nu, NX) + bsh, dtp),
            jax.ShapeDtypeStruct((N, nu) + bsh, dtp),
            jax.ShapeDtypeStruct((1, 1) + bsh, dtp),
        )
        out_specs = tuple(spec(s) for s in out_shapes[:3]) + \
            (self._cspec(out_shapes[3], bt),)
        k, K, gvec, lN = pl.pallas_call(
            functools.partial(_riccati_kernel_const, nu=nu, chunk=ck,
                              glow=self.gravity, al=luu_al is not None),
            grid=(nb, nc), out_shape=out_shapes,
            in_specs=in_specs, out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((NX,) + tsh, dtp),
                            pltpu.VMEM((NX, NX) + tsh, dtp)],
            interpret=self.interpret,
            compiler_params=None if self.interpret else _DIMSEM,
        )(*ins, *term, consts["Fu"], consts["Luu"])
        return k, K, gvec, lN[0, 0]

    def _rollout_lane(self, qR, qp, xi, us, k, K, lin, consts):
        N = self.N
        dtp = us.dtype
        nbd = 1 if self.S == 1 else 2
        B = int(np.prod(us.shape[-nbd:]))
        nu = us.shape[-nbd - 1]
        nb, bt = self._tiles(B)
        ck = self.stage_chunk
        bsh = self._bshape(B)
        tsh = self._bshape(bt)

        spec = lambda a: self._gspec(a, bt, ck)
        cspec = lambda a: self._cspec(a, bt)

        ins = [qR[:-1], qp[:-1], qR[1:], qp[1:], xi[:-1], xi[1:], us, k, K,
               lin["d"], lin["fqR"], lin["fqp"], lin["fxi"]]
        in_specs = [spec(a) for a in ins] + \
            [cspec(consts["Jl"]), cspec(consts["Jil"]),
             cspec(consts["Pu"]), cspec(consts["mg"])]
        out_shapes = (
            jax.ShapeDtypeStruct((N, 3, 3) + bsh, dtp),
            jax.ShapeDtypeStruct((N, 3) + bsh, dtp),
            jax.ShapeDtypeStruct((N, 6) + bsh, dtp),
            jax.ShapeDtypeStruct((N, nu) + bsh, dtp),
        )
        out_specs = tuple(spec(s) for s in out_shapes)
        kernel = functools.partial(_rollout_kernel_lane, dt=self.dt,
                                   gravity=self.gravity, chunk=ck)
        oR, op, oxi, ou = pl.pallas_call(
            kernel, grid=(nb, N // ck), out_shape=out_shapes, in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((3, 3) + tsh, dtp),
                            pltpu.VMEM((3,) + tsh, dtp),
                            pltpu.VMEM((6,) + tsh, dtp)],
            interpret=self.interpret,
            compiler_params=None if self.interpret else _DIMSEM,
        )(*ins, consts["Jl"], consts["Jil"], consts["Pu"], consts["mg"])
        qR_new = jnp.concatenate([qR[:1], oR], axis=0)
        qp_new = jnp.concatenate([qp[:1], op], axis=0)
        xi_new = jnp.concatenate([xi[:1], oxi], axis=0)
        return qR_new, qp_new, xi_new, ou

    def _rollout_linearize_lane(self, qR, qp, xi, us, k, K, lin, refs,
                                consts):
        """Fused rollout + next-iteration linearization (see the kernel)."""
        N = self.N
        dtp = us.dtype
        nbd = 1 if self.S == 1 else 2
        B = int(np.prod(us.shape[-nbd:]))
        nu = us.shape[-nbd - 1]
        nb, bt = self._tiles(B)
        ck = self.stage_chunk
        bsh = self._bshape(B)
        tsh = self._bshape(bt)

        spec = lambda a: self._gspec(a, bt, ck)
        cspec = lambda a: self._cspec(a, bt)

        ins = [qR[:-1], qp[:-1], qR[1:], qp[1:], xi[:-1], xi[1:], us, k, K,
               lin["d"], lin["fqR"], lin["fqp"], lin["fxi"],
               refs["RbiR"], refs["Rbip"], refs["Adb"], refs["xib"]]
        consts_in = [consts["Jl"], consts["Jil"], consts["W1"],
                     consts["W2"], consts["Pu"], consts["mg"]]
        in_specs = [spec(a) for a in ins] + [cspec(a) for a in consts_in]
        out_shapes = (
            jax.ShapeDtypeStruct((N, 3, 3) + bsh, dtp),   # oR
            jax.ShapeDtypeStruct((N, 3) + bsh, dtp),      # op
            jax.ShapeDtypeStruct((N, 6) + bsh, dtp),      # oxi
            jax.ShapeDtypeStruct((N, nu) + bsh, dtp),     # ou
            jax.ShapeDtypeStruct((N, 3, 3) + bsh, dtp),   # nfqR
            jax.ShapeDtypeStruct((N, 3) + bsh, dtp),      # nfqp
            jax.ShapeDtypeStruct((N, 6) + bsh, dtp),      # nfxi
            jax.ShapeDtypeStruct((N, 12) + bsh, dtp),     # nd
            jax.ShapeDtypeStruct((N, 12, 12) + bsh, dtp),  # nFx
            jax.ShapeDtypeStruct((N, 12) + bsh, dtp),     # nlx
            jax.ShapeDtypeStruct((N, 12, 12) + bsh, dtp),  # nlxx
            jax.ShapeDtypeStruct((N, 1) + bsh, dtp),      # nl
        )
        out_specs = tuple(spec(s) for s in out_shapes)
        kernel = functools.partial(_rollout_linearize_kernel, dt=self.dt,
                                   gravity=self.gravity,
                                   exact_grav=self.exact_grav, chunk=ck)
        (oR, op, oxi, ou, nfqR, nfqp, nfxi, nd, nFx, nlx, nlxx,
         nl) = pl.pallas_call(
            kernel, grid=(nb, N // ck), out_shape=out_shapes,
            in_specs=in_specs, out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((3, 3) + tsh, dtp),
                            pltpu.VMEM((3,) + tsh, dtp),
                            pltpu.VMEM((6,) + tsh, dtp)],
            interpret=self.interpret,
            compiler_params=None if self.interpret else _DIMSEM,
        )(*ins, *consts_in)
        qR_new = jnp.concatenate([qR[:1], oR], axis=0)
        qp_new = jnp.concatenate([qp[:1], op], axis=0)
        xi_new = jnp.concatenate([xi[:1], oxi], axis=0)
        new_lin = dict(fqR=nfqR, fqp=nfqp, fxi=nfxi, d=nd, Fx=nFx, lx=nlx,
                       lxx=nlxx, l=nl)
        return qR_new, qp_new, xi_new, ou, new_lin

    # ----------------------------------------------------------------------

    def _prepare(self, dyn, cost, q0s, xi0s, us0):
        """Lane-layout setup: broadcast consts/references to the lanes and
        build the initial (qR, qp, xi, us) state.  Split out of `_solve` so
        probes/tests can drive the kernels individually."""
        B = q0s.shape[0]
        N = self.N
        nu = us0.shape[-1]
        dtp = us0.dtype
        lanes = lambda M: jnp.broadcast_to(
            jnp.asarray(M, dtp)[..., None], jnp.asarray(M).shape + (B,))
        lanes66 = lanes
        Pu = getattr(dyn, "Pu", None)
        if Pu is None:
            Pu = jnp.eye(6, dtype=dtp)
        mg = (dyn.m * dyn.g if self.gravity else jnp.zeros((), dtp))
        bt6 = dyn.Jinv @ jnp.asarray(Pu, dtp)
        Fu_c = jnp.concatenate(
            [jnp.zeros_like(bt6), bt6], axis=-2) * dyn.dt  # (12, nu)
        consts = dict(
            Jl=lanes66(dyn.J), Jil=lanes66(dyn.Jinv),
            W1=lanes66(cost.Q1), W2=lanes66(cost.Q2),
            Fu=jnp.broadcast_to(jnp.asarray(Fu_c, dtp)[:, :, None],
                                (12, nu, B)),
            Luu=lanes66(2.0 * cost.R),
            Pu=lanes(Pu),
            mg=jnp.broadcast_to(jnp.asarray(mg, dtp), (1, B)),
        )
        ref = lambda x: jnp.moveaxis(
            jnp.broadcast_to(x[:, None], (x.shape[0], B) + x.shape[1:]), 1, -1)
        refs = dict(
            RbiR=ref(cost.q_ref_inv[:-1, :3, :3]),
            Rbip=ref(cost.q_ref_inv[:-1, :3, 3]),
            Adb=ref(cost.Ad_ref[:-1]),
            xib=ref(cost.xi_ref[:-1]),
        )

        # initial lane-layout state: x0 + reference tail
        q_ref_b = jnp.broadcast_to(cost.q_ref[1:][:, None],
                                   (N, B, 4, 4))
        qR = jnp.concatenate([jnp.moveaxis(q0s[None, :, :3, :3], 1, -1),
                              jnp.moveaxis(q_ref_b[:, :, :3, :3], 1, -1)], axis=0)
        qp = jnp.concatenate([jnp.moveaxis(q0s[None, :, :3, 3], 1, -1),
                              jnp.moveaxis(q_ref_b[:, :, :3, 3], 1, -1)], axis=0)
        xi_ref_b = jnp.broadcast_to(cost.xi_ref[1:][:, None], (N, B, 6))
        xi = jnp.concatenate([jnp.moveaxis(xi0s[None], 1, -1),
                              jnp.moveaxis(xi_ref_b, 1, -1)], axis=0)
        us = jnp.moveaxis(us0, 0, -1)  # (N, 6, B)
        return qR, qp, xi, us, refs, consts

    def _solve(self, dyn, cost, q0s, xi0s, us0, al=None):
        """dyn: SE3Params; cost: TrackingCostParams; solver-layout inputs.

        ``al``: optional input-box AL state (lb (nu,), ub (nu,),
        lmbd (B, N+1, 2nu), imu (B, N+1, 2nu) diagonal penalties) — adds the
        augmented-Lagrangian u-terms to every backward pass (the terminal
        box constraint is identically zero, models/constraints.py:38)."""
        B = q0s.shape[0]
        N = self.N
        dtp = us0.dtype
        pk = self._pack
        nbd = 1 if self.S == 1 else 2
        bsh = self._bshape(B)
        qR, qp, xi, us, refs, consts = self._prepare(dyn, cost, q0s, xi0s, us0)
        if self.S > 1:
            qR, qp, xi, us = pk(qR), pk(qp), pk(xi), pk(us)
            refs = {k_: pk(v) for k_, v in refs.items()}
            consts = {k_: pk(v) for k_, v in consts.items()}
        if al is not None:
            lb_a, ub_a, lmbd_a, imu_a = al
            lam_l = pk(jnp.moveaxis(lmbd_a, 0, -1))  # (N+1, 2nu, B...)
            imu_l = pk(jnp.moveaxis(imu_a, 0, -1))
            nu = us0.shape[-1]
            al = (jnp.asarray(lb_a, dtp), jnp.asarray(ub_a, dtp),
                  lam_l.astype(dtp), imu_l.astype(dtp), nu)
        lanes66 = lambda M: pk(jnp.broadcast_to(
            jnp.asarray(M, dtp)[..., None], jnp.asarray(M).shape + (B,)))
        ref = lambda x: pk(jnp.moveaxis(
            jnp.broadcast_to(x[:, None], (x.shape[0], B) + x.shape[1:]),
            1, -1))

        # constant lane-layout terminal references (the state parts of the
        # terminal quadratization are rebuilt per iteration in-kernel)
        RbiR_N = ref(cost.q_ref_inv[-1:, :3, :3])[0]
        Rbip_N = ref(cost.q_ref_inv[-1:, :3, 3])[0]
        Adb_N = ref(cost.Ad_ref[-1:])[0]
        xib_N = ref(cost.xi_ref[-1:])[0]
        W1N = lanes66(cost.P1)
        W2N = lanes66(cost.P2)

        def backward_metrics(qR, qp, xi, us, lin):
            lu = 2.0 * jnp.einsum("ij,nj...->ni...", cost.R.astype(dtp), us)
            luu_al = None
            J_al = jnp.zeros(bsh, dtp)
            if al is not None:
                lb_a, ub_a, lam_l, imu_l, nu = al
                bx = lambda v: v.reshape((1, -1) + (1,) * nbd)
                lam_lo, lam_hi = lam_l[:-1, :nu], lam_l[:-1, nu:]
                im_lo, im_hi = imu_l[:-1, :nu], imu_l[:-1, nu:]
                glo = bx(lb_a) - us
                ghi = us - bx(ub_a)
                lu = lu - (lam_lo + im_lo * glo) + (lam_hi + im_hi * ghi)
                luu_al = im_lo + im_hi
                J_al = jnp.sum(
                    lam_lo * glo + lam_hi * ghi
                    + 0.5 * (im_lo * glo * glo + im_hi * ghi * ghi),
                    axis=(0, 1))
            term = (qR[-1], qp[-1], xi[-1], RbiR_N, Rbip_N, Adb_N, xib_N,
                    W1N, W2N)
            k, K, gvec, lN = self._backward_lane(lin, lu, term, consts,
                                                 luu_al=luu_al)
            # gvec_t = lu + Fu^T (V_x[t+1] + V_xx[t+1] d[t]) from the kernel
            g = jnp.mean(jnp.sqrt(jnp.sum(gvec * gvec, axis=1)), axis=0)
            J = jnp.sum(lin["l"][:, 0], axis=0) + \
                jnp.einsum("ni...,ij,nj...->...", us, cost.R.astype(dtp),
                           us) + lN + J_al
            return k, K, J, g

        if self.fused:
            # 2 kernels/iteration: backward + (rollout fused with the next
            # iteration's linearization); one standalone linearize up front
            def body(_, carry):
                qR, qp, xi, us, lin, J, g = carry
                k, K, J, g = backward_metrics(qR, qp, xi, us, lin)
                qR, qp, xi, us, lin = self._rollout_linearize_lane(
                    qR, qp, xi, us, k, K, lin, refs, consts)
                return qR, qp, xi, us, lin, J, g

            lin0 = self._linearize_lane(qR, qp, xi, us, refs, consts)
            init = (qR, qp, xi, us, lin0, jnp.full(bsh, jnp.inf, dtp),
                    jnp.full(bsh, jnp.inf, dtp))
            qR, qp, xi, us, _, J, g = lax.fori_loop(
                0, self.iterations, body, init)
        else:
            def body(_, carry):
                qR, qp, xi, us, J, g = carry
                lin = self._linearize_lane(qR, qp, xi, us, refs, consts)
                k, K, J, g = backward_metrics(qR, qp, xi, us, lin)
                qR, qp, xi, us = self._rollout_lane(qR, qp, xi, us, k, K,
                                                    lin, consts)
                return qR, qp, xi, us, J, g

            init = (qR, qp, xi, us, jnp.full(bsh, jnp.inf, dtp),
                    jnp.full(bsh, jnp.inf, dtp))
            qR, qp, xi, us, J, g = lax.fori_loop(
                0, self.iterations, body, init)

        # back to solver layout
        upk = self._unpack
        bk = lambda x: jnp.moveaxis(upk(x), -1, 0)
        qs = jnp.zeros((B, N + 1, 4, 4), dtp)
        qs = qs.at[:, :, :3, :3].set(bk(qR))
        qs = qs.at[:, :, :3, 3].set(bk(qp))
        qs = qs.at[:, :, 3, 3].set(1.0)
        return PipelineState(qs=qs, xis=bk(xi), us=bk(us),
                             J_opt=upk(J) if self.S > 1 else J,
                             grad_norm=upk(g) if self.S > 1 else g)

    def solve(self, dyn, cost, q0s, xi0s, us0, al=None):
        return self._solve_jit(dyn, cost, jnp.asarray(q0s), jnp.asarray(xi0s),
                               jnp.asarray(us0), al)
