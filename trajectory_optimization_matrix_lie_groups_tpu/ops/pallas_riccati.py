"""Pallas TPU kernel: batched Riccati backward pass, lanes = problems.

The throughput workload is thousands of independent 12-dim Riccati sweeps
(one per MPC problem).  XLA's scan executes each stage as a chain of small
(B,12,12) ops with poor VPU utilization; this kernel restructures the
computation for the hardware:

- a tile of ``B`` problems rides the VPU *lane* dimension — every 12x12 /
  6x6 matrix entry is a (B,)-vector, so each "scalar" op is a full-width
  vector op;
- matmuls are unrolled broadcast-FMA chains, the 6x6 control-block solve is
  an unrolled lane-batched Cholesky + triangular substitutions (no
  linalg library calls);
- the stage recursion maps onto the TPU pallas *grid*, which executes
  sequentially: grid step ``s`` processes stage ``i = N-1-s`` via reversed
  BlockSpec index maps, the value-function carry lives in VMEM scratch that
  persists across grid steps, and the pipeline machinery double-buffers the
  per-stage HBM<->VMEM transfers automatically.

Layout contract (host side transposes): stage-major with batch last,
  Fx (N,12,12,B), Fu (N,12,6,B), d (N,12,B), Lx (N,12,B), Lu (N,6,B),
  Lxx (N,12,12,B), Lux (N,6,12,B), Luu (N,6,6,B), terminal LxN (12,B),
  LxxN (12,12,B).
Outputs: k (N,6,B), K (N,6,12,B), Vx1 (N,12,B), Vxx1 (N,12,12,B), with
Vx1[i]/Vxx1[i] the value function at stage i+1 (matching the sequential
backward's outputs).

Fixed mu = 0 (throughput mode — see solvers/riccati.py for why the
reference's adaptive per-step schedule is inherently sequential).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NX = 12  # default state dim; pallas_backward takes the actual nx from shapes
NU = 6   # default control dim; likewise


def _matmul(A, B, m):
    """C (n,p,BT) = A (n,m,BT) @ B (m,p,BT); entries are lane vectors."""
    C = A[:, 0:1, :] * B[0:1, :, :]
    for kk in range(1, m):
        C = C + A[:, kk:kk + 1, :] * B[kk:kk + 1, :, :]
    return C


def _matvec(A, v, m):
    """w (n,BT) = A (n,m,BT) @ v (m,BT)."""
    w = A[:, 0, :] * v[0:1, :]
    for kk in range(1, m):
        w = w + A[:, kk, :] * v[kk:kk + 1, :]
    return w


def _transpose(A):
    return jnp.swapaxes(A, 0, 1)


def _chol(Quu, nu=NU):
    """Lane-batched nu x nu Cholesky, fully unrolled (L[i][j] are (BT,) vectors)."""
    L = [[None] * nu for _ in range(nu)]
    for j in range(nu):
        s = Quu[j, j, :]
        for kk in range(j):
            s = s - L[j][kk] * L[j][kk]
        L[j][j] = jnp.sqrt(s)
        inv = 1.0 / L[j][j]
        for i in range(j + 1, nu):
            s = Quu[i, j, :]
            for kk in range(j):
                s = s - L[i][kk] * L[j][kk]
            L[i][j] = s * inv
    return L


def _chol_solve_mat(L, B, nu=NU):
    """Solve (L L^T) X = B for B (nu, p, BT) without stack/concat."""
    Y = [None] * nu
    for i in range(nu):
        s = B[i, :, :]
        for kk in range(i):
            s = s - L[i][kk][None, :] * Y[kk]
        Y[i] = s / L[i][i][None, :]
    X = [None] * nu
    for i in reversed(range(nu)):
        s = Y[i]
        for kk in range(i + 1, nu):
            s = s - L[kk][i][None, :] * X[kk]
        X[i] = s / L[i][i][None, :]
    # assemble via broadcast-add (avoids jnp.stack / scatter, which Mosaic
    # does not lower)
    rows = jax.lax.broadcasted_iota(jnp.int32, (nu, 1, 1), 0)
    out = jnp.zeros_like(B)
    for i in range(nu):
        onehot = (rows == i).astype(B.dtype)
        out = out + onehot * X[i][None, :, :]
    return out


def _riccati_kernel(fx_ref, fu_ref, d_ref, lx_ref, lu_ref, lxx_ref, lux_ref,
                    luu_ref, lxN_ref, lxxN_ref,
                    k_ref, K_ref, Vx1_ref, Vxx1_ref,
                    Vx_s, Vxx_s, *, nu, nx=NX):
    # grid = (batch_tiles, N): stage recursion rides dim 1; a fresh batch
    # tile (stage index 0) re-initializes the value-function carry.
    @pl.when(pl.program_id(1) == 0)
    def _init():
        Vx_s[:] = lxN_ref[:]
        Vxx_s[:] = lxxN_ref[:]

    fx = fx_ref[0]
    fu = fu_ref[0]
    dd = d_ref[0]
    Vx = Vx_s[:]
    Vxx = Vxx_s[:]

    fxT = _transpose(fx)
    fuT = _transpose(fu)
    Vmod = Vx + _matvec(Vxx, dd, nx)
    Qx = lx_ref[0] + _matvec(fxT, Vmod, nx)
    Qu = lu_ref[0] + _matvec(fuT, Vmod, nx)
    VF = _matmul(Vxx, fx, nx)
    Qxx = lxx_ref[0] + _matmul(fxT, VF, nx)
    Qux = lux_ref[0] + _matmul(fuT, VF, nx)
    Quu = luu_ref[0] + _matmul(fuT, _matmul(Vxx, fu, nx), nx)

    L = _chol(Quu, nu)
    K = -_chol_solve_mat(L, Qux, nu)                      # (nu, 12, BT)
    k = -_chol_solve_mat(L, Qu[:, None, :], nu)[:, 0, :]  # (nu, BT)

    KT = _transpose(K)
    QuxT = _transpose(Qux)
    KTQuu = _matmul(KT, Quu, nu)
    Vx_new = (Qx + _matvec(KTQuu, k, nu) + _matvec(KT, Qu, nu)
              + _matvec(QuxT, k, nu))
    Vxx_new = (Qxx + _matmul(KTQuu, K, nu) + _matmul(KT, Qux, nu)
               + _matmul(QuxT, K, nu))
    Vxx_new = 0.5 * (Vxx_new + _transpose(Vxx_new))

    k_ref[0] = k
    K_ref[0] = K
    Vx1_ref[0] = Vx
    Vxx1_ref[0] = Vxx
    Vx_s[:] = Vx_new
    Vxx_s[:] = Vxx_new


@functools.partial(jax.jit, static_argnames=("interpret", "batch_tile"))
def pallas_backward(Fx, Fu, d, Lx, Lu, Lxx, Lux, Luu, interpret=False,
                    batch_tile=None):
    """Batched Riccati backward (mu = 0) via the Pallas grid-pipeline kernel.

    Inputs in solver layout: Fx (B,N,nx,nx), Fu (B,N,nx,nu), d (B,N,nx),
    Lx (B,N+1,nx), Lu (B,N,nu), Lxx (B,N+1,nx,nx), Lux (B,N,nu,nx),
    Luu (B,N,nu,nu) — nx/nu from the shapes (12/6 SE(3), 6/3 SO(3)).
    Returns (k, K, Vx1, Vxx1) in solver layout.

    ``batch_tile`` (static, divides B): lanes per grid step.  The grid is
    (B // batch_tile, N); each batch tile sweeps the full backward recursion
    before the next tile starts, so VMEM holds one tile's blocks instead of
    the whole batch (needed for B > ~512 at f32).
    """
    B, N = Fx.shape[0], Fx.shape[1]
    nu = Fu.shape[-1]
    nx = Fx.shape[-1]
    dt = Fx.dtype
    bt = B if batch_tile is None else batch_tile
    if B % bt:
        raise ValueError(f"batch {B} not divisible by batch_tile {bt}")
    nb = B // bt

    def to_lanes(x):
        return jnp.moveaxis(x, 0, -1)  # (B, N, ...) -> (N, ..., B)

    stage_args = [to_lanes(a) for a in
                  (Fx, Fu, d, Lx[:, :-1], Lu, Lxx[:, :-1], Lux, Luu)]
    lxN = jnp.moveaxis(Lx[:, -1], 0, -1)      # (12, B)
    lxxN = jnp.moveaxis(Lxx[:, -1], 0, -1)    # (12, 12, B)

    rev = lambda s: (lambda b, i: (N - 1 - i,) + (0,) * (len(s) - 2) + (b,))
    tile = lambda s: (lambda b, i: (0,) * (len(s) - 1) + (b,))
    stage_specs = [
        pl.BlockSpec((1,) + a.shape[1:-1] + (bt,), rev(a.shape))
        for a in stage_args
    ]
    term_specs = [
        pl.BlockSpec(lxN.shape[:-1] + (bt,), tile(lxN.shape)),
        pl.BlockSpec(lxxN.shape[:-1] + (bt,), tile(lxxN.shape)),
    ]

    out_shapes = (
        jax.ShapeDtypeStruct((N, nu, B), dt),
        jax.ShapeDtypeStruct((N, nu, nx, B), dt),
        jax.ShapeDtypeStruct((N, nx, B), dt),
        jax.ShapeDtypeStruct((N, nx, nx, B), dt),
    )
    out_specs = tuple(
        pl.BlockSpec((1,) + s.shape[1:-1] + (bt,), rev(s.shape))
        for s in out_shapes
    )

    k_l, K_l, Vx1_l, Vxx1_l = pl.pallas_call(
        functools.partial(_riccati_kernel, nu=nu, nx=nx),
        grid=(nb, N),
        out_shape=out_shapes,
        in_specs=stage_specs + term_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((nx, bt), dt),
            pltpu.VMEM((nx, nx, bt), dt),
        ],
        interpret=interpret,
    )(*stage_args, lxN, lxxN)

    back = lambda x: jnp.moveaxis(x, -1, 0)
    return back(k_l), back(K_l), back(Vx1_l), back(Vxx1_l)
