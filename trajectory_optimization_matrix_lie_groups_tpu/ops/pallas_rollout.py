"""Pallas TPU kernel: batched gap-closing nonlinear MS rollout.

Forward twin of `ops/pallas_riccati.py`: the sequential stage recursion
    xs_err = [Log(q_i^-1 q_new); xi_new - xi_i]
    u_new  = u_i + k_i + K_i xs_err
    f(q_new, xi_new, u_new)            (SE(3) free rigid body, Euler)
    q+     = normalize(q_{i+1} Exp(d_q) f(x_i)^-1 f(x_new))
    xi+    = xi_{i+1} + fxi_new - fxi_i + d_xi
(`traopt_controller.py:2697-2718` semantics, alpha = 1) runs on the
sequential TPU grid with the carry in VMEM scratch and B problems on the
lanes, using the lane-layout Lie primitives of `ops/pallas_lie.py` —
including in-kernel SE(3) exp/log and branchless quaternion
renormalization.

Scope: `se3_dynamics` (free rigid body).  Pose-dependent-force models keep
the XLA scan path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trajectory_optimization_matrix_lie_groups_tpu.ops import pallas_lie as pll


def _cross(a, b):
    return pll._vec([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


def _matvec6(M, v):
    """(6,6,B) @ (6,B)."""
    return sum(M[:, k, :] * v[k:k + 1, :] for k in range(6))


def _rollout_kernel(qR_ref, qp_ref, qRn_ref, qpn_ref, xi_ref, xin_ref,
                    u_ref, k_ref, K_ref, d_ref, fxi_ref,
                    edR_ref, edp_ref, fiR_ref, fip_ref,
                    Jl_ref, Jil_ref,
                    oR_ref, op_ref, oxi_ref, ou_ref,
                    R_s, p_s, xi_s, *, dt):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        R_s[:] = qR_ref[0]
        p_s[:] = qp_ref[0]
        xi_s[:] = xi_ref[0]

    R_new, p_new, xi_new = R_s[:], p_s[:], xi_s[:]
    R_i, p_i = qR_ref[0], qp_ref[0]
    xi_i = xi_ref[0]

    # xs_err = [Log(q_i^-1 q_new); xi_new - xi_i]
    Ri_inv, pi_inv = pll.se3_inverse(R_i, p_i)
    Re, pe = pll.se3_compose(Ri_inv, pi_inv, R_new, p_new)
    err_pose = pll.se3_log(Re, pe)
    xs_err = jnp.concatenate([err_pose, xi_new - xi_i], axis=0)  # (12,B)

    # u_new = u + k + K xs_err
    K = K_ref[0]  # (6, 12, B)
    u_new = u_ref[0] + k_ref[0] + sum(
        K[:, j, :] * xs_err[j:j + 1, :] for j in range(12))

    # dynamics step at (q_new, xi_new, u_new)
    ReE, peE = pll.se3_exp(xi_new * dt)
    fqR, fqp = pll.se3_compose(R_new, p_new, ReE, peE)
    fqR = pll.so3_normalize(fqR)
    Jxi = _matvec6(Jl_ref[:], xi_new)          # J xi
    w = xi_new[:3]
    v = xi_new[3:]
    tw = Jxi[:3]
    tv = Jxi[3:]
    # coad(xi) (J xi) = [-w x tw - v x tv ; -w x tv]
    top = -_cross(w, tw) - _cross(v, tv)
    bot = -_cross(w, tv)
    wrench = jnp.concatenate([top, bot], axis=0) + u_new
    fxi_new = xi_new + dt * _matvec6(Jil_ref[:], wrench)

    # gap closure: q+ = q_{i+1} Exp(d) fq^-1 fq_new
    R_a, p_a = pll.se3_compose(qRn_ref[0], qpn_ref[0], edR_ref[0], edp_ref[0])
    R_b, p_b = pll.se3_compose(R_a, p_a, fiR_ref[0], fip_ref[0])
    R_nn, p_nn = pll.se3_compose(R_b, p_b, fqR, fqp)
    R_nn = pll.so3_normalize(R_nn)
    d = d_ref[0]
    xi_nn = xin_ref[0] + fxi_new - fxi_ref[0] + d[6:]

    oR_ref[0] = R_nn
    op_ref[0] = p_nn
    oxi_ref[0] = xi_nn
    ou_ref[0] = u_new
    R_s[:] = R_nn
    p_s[:] = p_nn
    xi_s[:] = xi_nn


@functools.partial(jax.jit, static_argnames=("dt", "interpret"))
def pallas_rollout(qs, xis, us, k, K, d, fxi, exp_d, fq_inv, Jm, Jinv, dt,
                   interpret=False):
    """Batched gap-closing rollout via the Pallas kernel.

    Solver-layout inputs: qs (B,N+1,4,4), xis (B,N+1,6), us/k (B,N,6),
    K (B,N,6,12), d (B,N,12), fxi (B,N,6), exp_d (B,N,4,4) = Exp(d_q),
    fq_inv (B,N,4,4), Jm/Jinv (6,6), dt static float.

    Returns (qs_new (B,N+1,4,4), xis_new, us_new) matching
    `FastBatchSolver._rollout`.
    """
    B, Np1 = qs.shape[0], qs.shape[1]
    N = Np1 - 1
    dtp = qs.dtype

    tl = lambda x: jnp.moveaxis(x, 0, -1)  # (B, N, ...) -> (N, ..., B)
    qR = tl(qs[:, :, :3, :3])
    qp = tl(qs[:, :, :3, 3])
    args = dict(
        qR=qR[:-1], qp=qp[:-1], qRn=qR[1:], qpn=qp[1:],
        xi=tl(xis)[:-1], xin=tl(xis)[1:],
        u=tl(us), k=tl(k), K=tl(K), d=tl(d), fxi=tl(fxi),
        edR=tl(exp_d[:, :, :3, :3]), edp=tl(exp_d[:, :, :3, 3]),
        fiR=tl(fq_inv[:, :, :3, :3]), fip=tl(fq_inv[:, :, :3, 3]),
    )
    Jl = jnp.broadcast_to(jnp.asarray(Jm, dtp)[:, :, None], (6, 6, B))
    Jil = jnp.broadcast_to(jnp.asarray(Jinv, dtp)[:, :, None], (6, 6, B))

    def spec(a):
        return pl.BlockSpec((1,) + a.shape[1:], lambda i: (i,) + (0,) * (len(a.shape) - 1))

    in_specs = [spec(a) for a in args.values()] + \
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    out_shapes = (
        jax.ShapeDtypeStruct((N, 3, 3, B), dtp),
        jax.ShapeDtypeStruct((N, 3, B), dtp),
        jax.ShapeDtypeStruct((N, 6, B), dtp),
        jax.ShapeDtypeStruct((N, 6, B), dtp),
    )
    out_specs = tuple(spec(jnp.zeros(s.shape, dtp)) for s in out_shapes)

    kernel = functools.partial(_rollout_kernel, dt=float(dt))
    oR, op, oxi, ou = pl.pallas_call(
        kernel,
        grid=(N,),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((3, 3, B), dtp),
            pltpu.VMEM((3, B), dtp),
            pltpu.VMEM((6, B), dtp),
        ],
        interpret=interpret,
    )(*args.values(), Jl, Jil)

    bk = lambda x: jnp.moveaxis(x, -1, 0)
    qs_t = jnp.zeros((B, N, 4, 4), dtp)
    qs_t = qs_t.at[:, :, :3, :3].set(bk(oR))
    qs_t = qs_t.at[:, :, :3, 3].set(bk(op))
    qs_t = qs_t.at[:, :, 3, 3].set(1.0)
    qs_new = jnp.concatenate([qs[:, :1], qs_t], axis=1)
    xis_new = jnp.concatenate([xis[:, :1], bk(oxi)], axis=1)
    return qs_new, xis_new, bk(ou)
