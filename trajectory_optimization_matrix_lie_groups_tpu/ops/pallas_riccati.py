"""Pallas TPU kernel: batched Riccati backward pass, lanes = problems.

The throughput workload is thousands of independent 12-dim Riccati sweeps
(one per MPC problem).  XLA's scan executes each stage as a chain of small
(B,12,12) ops with HBM round-trips and poor VPU utilization.  This kernel
restructures the computation for the hardware: a tile of ``BT = 128``
problems rides the VPU *lane* dimension, every 12x12/6x6 matrix entry is a
(BT,)-vector, and the whole N-stage recursion runs inside one kernel with
stage slices DMA'd HBM->VMEM and all linear algebra (matmuls via broadcast
FMA chains, Cholesky factorization and triangular solves unrolled over the
static 6x6 control block) executed on VMEM tiles.

Layout contract (host side prepares these):
    Fx   (N, 12, 12, B)    Lxx  (N+1, 12, 12, B)
    Fu   (N, 12, 6, B)     Lux  (N, 6, 12, B)
    d    (N, 12, B)        Luu  (N, 6, 6, B)
    Lx   (N+1, 12, B)      Lu   (N, 6, B)
outputs:
    k (N, 6, B), K (N, 6, 12, B), Vx1 (N, 12, B), Vxx1 (N, 12, 12, B)
(Vx1[i]/Vxx1[i] = value function at stage i+1, matching the sequential
backward's outputs.)

Fixed mu = 0 (throughput mode — see solvers/riccati.py docstring for why the
reference's adaptive per-step schedule is inherently sequential).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NX = 12
NU = 6


def _matmul(A, B, n, m, p):
    """C (n,p,BT) = A (n,m,BT) @ B (m,p,BT), entries are lane vectors."""
    C = A[:, 0:1, :] * B[0:1, :, :]
    for kk in range(1, m):
        C = C + A[:, kk:kk + 1, :] * B[kk:kk + 1, :, :]
    return C


def _matvec(A, v, n, m):
    """w (n,BT) = A (n,m,BT) @ v (m,BT)."""
    w = A[:, 0, :] * v[0:1, :]
    for kk in range(1, m):
        w = w + A[:, kk, :] * v[kk:kk + 1, :]
    return w


def _transpose(A):
    return jnp.swapaxes(A, 0, 1)


def _chol(Quu):
    """Lane-batched 6x6 Cholesky, fully unrolled.  Returns rows list of
    lists of (BT,) vectors: L[i][j] for j <= i."""
    L = [[None] * NU for _ in range(NU)]
    for j in range(NU):
        s = Quu[j, j, :]
        for kk in range(j):
            s = s - L[j][kk] * L[j][kk]
        L[j][j] = jnp.sqrt(s)
        inv = 1.0 / L[j][j]
        for i in range(j + 1, NU):
            s = Quu[i, j, :]
            for kk in range(j):
                s = s - L[i][kk] * L[j][kk]
            L[i][j] = s * inv
    return L


def _chol_solve(L, B, ncols):
    """Solve (L L^T) X = B for B (6, ncols, BT); returns (6, ncols, BT)."""
    # forward substitution L Y = B
    Y = [None] * NU
    for i in range(NU):
        s = B[i]
        for kk in range(i):
            s = s - L[i][kk][None, :] * Y[kk]
        Y[i] = s / L[i][i][None, :]
    # back substitution L^T X = Y
    X = [None] * NU
    for i in reversed(range(NU)):
        s = Y[i]
        for kk in range(i + 1, NU):
            s = s - L[kk][i][None, :] * X[kk]
        X[i] = s / L[i][i][None, :]
    return jnp.stack(X, axis=0)


def _riccati_kernel(Fx_hbm, Fu_hbm, d_hbm, Lx_hbm, Lu_hbm, Lxx_hbm, Lux_hbm,
                    Luu_hbm, k_hbm, K_hbm, Vx1_hbm, Vxx1_hbm,
                    Vx_s, Vxx_s, stage_s, out_s, sem_in, sem_out, *, N):
    # load terminal value function
    def load(dst, src_ref, idx, sem):
        cp = pltpu.make_async_copy(src_ref.at[idx], dst, sem)
        cp.start()
        cp.wait()

    load(Vx_s, Lx_hbm, N, sem_in.at[0])
    load(Vxx_s, Lxx_hbm, N, sem_in.at[1])

    def body(step, _):
        i = N - 1 - step
        # stage slices HBM -> VMEM scratch
        fx_b, fu_b, d_b, lx_b, lu_b, lxx_b, lux_b, luu_b = (
            stage_s[0], stage_s[1], stage_s[2], stage_s[3], stage_s[4],
            stage_s[5], stage_s[6], stage_s[7])
        load(fx_b, Fx_hbm, i, sem_in.at[0])
        load(fu_b, Fu_hbm, i, sem_in.at[1])
        load(d_b, d_hbm, i, sem_in.at[2])
        load(lx_b, Lx_hbm, i, sem_in.at[3])
        load(lu_b, Lu_hbm, i, sem_in.at[4])
        load(lxx_b, Lxx_hbm, i, sem_in.at[5])
        load(lux_b, Lux_hbm, i, sem_in.at[6])
        load(luu_b, Luu_hbm, i, sem_in.at[7])

        fx = fx_b[:]
        fu = fu_b[:]
        dd = d_b[:]
        Vx = Vx_s[:]
        Vxx = Vxx_s[:]

        fxT = _transpose(fx)
        fuT = _transpose(fu)
        Vmod = Vx + _matvec(Vxx, dd, NX, NX)
        Qx = lx_b[:] + _matvec(fxT, Vmod, NX, NX)
        Qu = lu_b[:] + _matvec(fuT, Vmod, NU, NX)
        VF = _matmul(Vxx, fx, NX, NX, NX)
        Qxx = lxx_b[:] + _matmul(fxT, VF, NX, NX, NX)
        Qux = lux_b[:] + _matmul(fuT, VF, NU, NX, NX)
        Quu = luu_b[:] + _matmul(fuT, _matmul(Vxx, fu, NX, NX, NU), NU, NX, NU)

        L = _chol(Quu)
        # joint RHS: [Qu | Qux] (6, 1+12, BT)
        rhs = jnp.concatenate([Qu[:, None, :], Qux], axis=1)
        sol = _chol_solve(L, rhs, 1 + NX)
        k = -sol[:, 0, :]
        K = -sol[:, 1:, :]

        KT = _transpose(K)
        QuxT = _transpose(Qux)
        KTQuu = _matmul(KT, Quu, NX, NU, NU)
        Vx_new = (Qx + _matvec(KTQuu, k, NX, NU) + _matvec(KT, Qu, NX, NU)
                  + _matvec(QuxT, k, NX, NU))
        Vxx_new = (Qxx + _matmul(KTQuu, K, NX, NU, NX)
                   + _matmul(KT, Qux, NX, NU, NX)
                   + _matmul(QuxT, K, NX, NU, NX))
        Vxx_new = 0.5 * (Vxx_new + _transpose(Vxx_new))

        # write stage outputs (k, K, V at i+1)
        out_s[0][:] = k
        out_s[1][:] = K
        out_s[2][:] = Vx
        out_s[3][:] = Vxx
        for buf, dst in ((out_s[0], k_hbm), (out_s[1], K_hbm),
                         (out_s[2], Vx1_hbm), (out_s[3], Vxx1_hbm)):
            cp = pltpu.make_async_copy(buf, dst.at[i], sem_out)
            cp.start()
            cp.wait()

        Vx_s[:] = Vx_new
        Vxx_s[:] = Vxx_new
        return 0

    jax.lax.fori_loop(0, N, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_backward(Fx, Fu, d, Lx, Lu, Lxx, Lux, Luu, interpret=False):
    """Batched Riccati backward (mu = 0) via the Pallas kernel.

    Inputs in solver layout: Fx (B,N,12,12), Fu (B,N,12,6), d (B,N,12),
    Lx (B,N+1,12), Lu (B,N,6), Lxx (B,N+1,12,12), Lux (B,N,6,12),
    Luu (B,N,6,6).  Returns (k, K, Vx1, Vxx1) in solver layout.
    """
    B, N = Fx.shape[0], Fx.shape[1]
    dt = Fx.dtype

    def to_lanes(x):
        # (B, N, ...) -> (N, ..., B)
        return jnp.moveaxis(x, 0, -1)

    args = [to_lanes(a) for a in (Fx, Fu, d, Lx, Lu, Lxx, Lux, Luu)]

    kernel = functools.partial(_riccati_kernel, N=N)
    out_shapes = (
        jax.ShapeDtypeStruct((N, NU, B), dt),
        jax.ShapeDtypeStruct((N, NU, NX, B), dt),
        jax.ShapeDtypeStruct((N, NX, B), dt),
        jax.ShapeDtypeStruct((N, NX, NX, B), dt),
    )
    stage_scratch = [
        pltpu.VMEM((NX, NX, B), dt),   # fx
        pltpu.VMEM((NX, NU, B), dt),   # fu
        pltpu.VMEM((NX, B), dt),       # d
        pltpu.VMEM((NX, B), dt),       # lx
        pltpu.VMEM((NU, B), dt),       # lu
        pltpu.VMEM((NX, NX, B), dt),   # lxx
        pltpu.VMEM((NU, NX, B), dt),   # lux
        pltpu.VMEM((NU, NU, B), dt),   # luu
    ]
    out_scratch = [
        pltpu.VMEM((NU, B), dt),
        pltpu.VMEM((NU, NX, B), dt),
        pltpu.VMEM((NX, B), dt),
        pltpu.VMEM((NX, NX, B), dt),
    ]

    k_l, K_l, Vx1_l, Vxx1_l = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 8,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.ANY)] * 4),
        scratch_shapes=[
            pltpu.VMEM((NX, B), dt),       # Vx carry
            pltpu.VMEM((NX, NX, B), dt),   # Vxx carry
            stage_scratch,
            out_scratch,
            pltpu.SemaphoreType.DMA((8,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*args)

    back = lambda x: jnp.moveaxis(x, -1, 0)
    return back(k_l), back(K_l), back(Vx1_l), back(Vxx1_l)
