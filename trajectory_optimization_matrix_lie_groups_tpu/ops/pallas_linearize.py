"""Pallas TPU kernel: fused per-stage linearization + GN quadratization.

The third kernel of the fast iteration (with `pallas_riccati` and
`pallas_rollout`): for every stage, in one pass over VMEM tiles with B
problems on the lanes, compute

    dynamics eval   fq = normalize(q Exp(xi dt)),  fxi (Euler-Poincare)
    defect          d = [Log(q_{i+1}^-1 fq); fxi - xi_{i+1}]
    dynamics jac    Fx = [[Ad(Exp(-tau)), Jr(tau) dt], [0, I + H dt]]
                    (H with the reference coad-swap quirk)
    cost quad       e = Log(q qbar^-1),  J_e_x = Jr^-1(e) Ad(qbar),
                    l, lx, lxx (Gauss-Newton)

This stage work is embarrassingly parallel; the grid runs over stages and
the pipeline overlaps the HBM<->VMEM block transfers with compute.  Control
Fu / lu / luu / lux are constant or trivially computed outside.

Scope: `se3_dynamics` + GN tracking cost (the MPC benchmark family).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trajectory_optimization_matrix_lie_groups_tpu.ops import dfx
from trajectory_optimization_matrix_lie_groups_tpu.ops import pallas_lie as pll


def _cross(a, b):
    return pll._vec([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


def stage_dynamics_eval(R, p, xi, u, Jl, Jil, Pu, mg, *, dt, gravity,
                        terms=None, renorm=None):
    """Semi-implicit Euler step in lane layout (models/dynamics.py:196,287):
    fq = normalize(q Exp(xi dt)); fxi = xi + dt Jinv (coad(xi) J xi
    [+ m g R^T down] + Pu u).  Shared by the linearize, rollout, and fused
    rollout+linearize kernels.  ``terms``/``renorm``: DF series truncation
    and renormalizer override for the polish rollout (whose per-step
    rotation |xi| dt is small and whose kernel body must stay under the
    remote compiler's primitive ceiling; defaults unchanged)."""
    Re, pe = pll.se3_exp(xi * dt, terms=terms)
    fqR, fqp = pll.se3_compose(R, p, Re, pe)
    fqR = (renorm or pll.so3_normalize)(fqR)
    Jxi = pll.matvec(Jl, xi, 6)
    w, v = xi[:3], xi[3:]
    nu = u.shape[0]
    wrench = dfx.concatenate(
        [-_cross(w, Jxi[:3]) - _cross(v, Jxi[3:]), -_cross(w, Jxi[3:])],
        axis=0) + pll.matvec(Pu, u, nu)
    if gravity:
        # down = (0, 0, -1): R^T down = -(third row of R)
        g_lin = -mg[0][None, :] * R[2]
        wrench = wrench + dfx.concatenate(
            [dfx.zeros_like(g_lin), g_lin], axis=0)
    fxi = xi + dt * pll.matvec(Jil, wrench, 6)
    return fqR, fqp, fxi


def stage_jacobian(R, xi, Jl, Jil, mg, *, dt, gravity, exact_grav):
    """Lane-layout Fx (models/dynamics.py:234 free body, :1092 gravity) with
    the reference's coad-swap quirk #1 (traopt_dynamics.py:819,832) and its
    gravity-Jacobian quirk #2 (no m*g factor unless ``exact_grav``,
    traopt_dynamics.py:1121-1134)."""
    bs = R.shape[2:]  # trailing batch dims: (B,) or (S, L)
    dtp = R.dtype
    w, v = xi[:3], xi[3:]
    tau = xi * dt
    ReN, peN = pll.se3_exp(-tau)
    J_q_q = pll.se3_Ad(ReN, peN)
    J_q_xi = pll.se3_right_jacobian(tau) * dt
    # coad(eta) = ad(eta)^T = [[-hat(ew), -hat(ev)], [0, -hat(ew)]],
    # applied to the [v, w]-SWAPPED twist (reference quirk #1)
    coad_sw = pll.blk(-pll.hat(v), -pll.hat(w),
                      dfx.zeros((3, 3) + bs, dtp, like=v), -pll.hat(v))
    Ibw = pll.matvec3(Jl[0:3, 0:3], w)
    m = Jl[4, 4]
    Gw = pll.hat(Ibw)
    Gv = m[None, None] * pll.hat(v)
    G = pll.blk(Gw, Gv, Gv, dfx.zeros((3, 3) + bs, dtp, like=Gv))
    H = pll.matmul(Jil, pll.matmul(coad_sw, Jl, 6) + G, 6)
    eye6 = pll.blk(pll._eye3(dtp, bs), jnp.zeros((3, 3) + bs, dtp),
                   jnp.zeros((3, 3) + bs, dtp), pll._eye3(dtp, bs))
    if gravity:
        grow = -R[2] if not exact_grav else -(mg[0][None] * R[2])
        Z3 = dfx.zeros((3, 3) + bs, dtp, like=R)
        J_xi_q = pll.matmul(Jil, pll.blk(Z3, Z3, pll.hat(grow), Z3), 6) * dt
    else:
        J_xi_q = dfx.zeros((6, 6) + bs, dtp, like=R)
    return pll.blk(J_q_q, J_q_xi, J_xi_q, eye6 + H * dt)


def stage_cost_quad(R, p, xi, RbiR, Rbip, Adb, xib, W1, W2):
    """Lane-layout GN tracking quadratization (models/costs.py:103):
    e = Log(q q_ref^-1), J_e_x = Jr^-1(e) Ad_ref; returns (lx (12,B),
    lxx (12,12,B), l (B,)).  Also the terminal quadratization with (P1, P2)
    weights (the Riccati kernel's carry init)."""
    bs = R.shape[2:]  # trailing batch dims: (B,) or (S, L)
    dtp = R.dtype
    Reb, peb = pll.se3_compose(R, p, RbiR, Rbip)
    e = pll.se3_log(Reb, peb)
    ev = xi - xib
    Jex = pll.matmul(pll.se3_right_jacobian_inv(e), Adb, 6)
    JT2 = 2.0 * pll.transpose(Jex)
    W1e = pll.matvec(W1, e, 6)
    W2ev = pll.matvec(W2, ev, 6)
    lx = dfx.concatenate([pll.matvec(JT2, W1e, 6), 2.0 * W2ev], axis=0)
    H_e = pll.matmul(pll.matmul(JT2, W1, 6), Jex, 6)
    lxx = pll.blk(H_e, dfx.zeros((6, 6) + bs, dtp, like=H_e),
                  dfx.zeros((6, 6) + bs, dtp, like=H_e), 2.0 * W2)
    l_val = (sum(e[i] * W1e[i] for i in range(6))
             + sum(ev[i] * W2ev[i] for i in range(6)))
    return lx, lxx, l_val


def _linearize_kernel(qR_ref, qp_ref, qRn_ref, qpn_ref, xi_ref, xin_ref,
                      u_ref, RbiR_ref, Rbip_ref, Adb_ref, xib_ref,
                      Jl_ref, Jil_ref, W1_ref, W2_ref, Pu_ref, mg_ref,
                      fqR_ref, fqp_ref, fxi_ref, d_ref, Fx_ref, lx_ref,
                      lxx_ref, l_ref, *, dt, gravity=False, exact_grav=False,
                      chunk=1):
    """``gravity``/``exact_grav`` (static) select the rigid-body/drone family
    (models/dynamics.py:287-315): wrench gains m g R^T down, the input enters
    through the (6, nu) projection Pu, and Fx gains the J_xi_q block (built
    WITHOUT the m g factor unless ``exact_grav`` — reference quirk #2,
    traopt_dynamics.py:1121-1134).  ``chunk`` stages are processed per grid
    step (stage work is independent; bigger blocks amortize transfers)."""
    for t in range(chunk):
        R = qR_ref[t]
        p = qp_ref[t]
        xi = xi_ref[t]
        u = u_ref[t]

        fqR, fqp, fxi = stage_dynamics_eval(
            R, p, xi, u, Jl_ref[:], Jil_ref[:], Pu_ref[:], mg_ref,
            dt=dt, gravity=gravity)

        # defect d = [Log(q_{i+1}^-1 fq); fxi - xi_{i+1}]
        Rni, pni = pll.se3_inverse(qRn_ref[t], qpn_ref[t])
        Rd, pd = pll.se3_compose(Rni, pni, fqR, fqp)
        d_pose = pll.se3_log(Rd, pd)
        d = jnp.concatenate([d_pose, fxi - xin_ref[t]], axis=0)

        Fx = stage_jacobian(R, xi, Jl_ref[:], Jil_ref[:], mg_ref,
                            dt=dt, gravity=gravity, exact_grav=exact_grav)
        lx, lxx, l_val = stage_cost_quad(
            R, p, xi, RbiR_ref[t], Rbip_ref[t], Adb_ref[t], xib_ref[t],
            W1_ref[:], W2_ref[:])

        fqR_ref[t] = fqR
        fqp_ref[t] = fqp
        fxi_ref[t] = fxi
        d_ref[t] = d
        Fx_ref[t] = Fx
        lx_ref[t] = lx
        lxx_ref[t] = lxx
        l_ref[t] = l_val[None, :]


@functools.partial(jax.jit, static_argnames=("dt", "interpret", "gravity",
                                              "exact_grav"))
def pallas_linearize(qs, xis, us, q_ref_inv, Ad_ref, xi_ref, Jm, Jinv,
                     W1, W2, dt, interpret=False, Pu=None, mg=None,
                     gravity=False, exact_grav=False):
    """Fused stage linearization (se3 free body + GN tracking cost).

    Solver-layout inputs: qs (B,N+1,4,4), xis (B,N+1,6), us (B,N,6);
    reference data q_ref_inv (N+1,4,4), Ad_ref (N+1,6,6), xi_ref (N+1,6);
    constants Jm/Jinv/W1/W2 (6,6); dt static.

    Returns dict(fq, fxi, d, Fx, lx, lxx, l) in solver layout for stages
    0..N-1 (terminal quadratization stays outside).
    """
    B, Np1 = qs.shape[0], qs.shape[1]
    N = Np1 - 1
    dtp = qs.dtype

    tl = lambda x: jnp.moveaxis(x, 0, -1)
    qR = tl(qs[:, :, :3, :3])
    qp = tl(qs[:, :, :3, 3])
    ref = lambda x: jnp.broadcast_to(x[:, None], (x.shape[0], B) + x.shape[1:])
    RbiR = jnp.moveaxis(ref(q_ref_inv[:-1, :3, :3]), 1, -1)
    Rbip = jnp.moveaxis(ref(q_ref_inv[:-1, :3, 3]), 1, -1)
    Adb = jnp.moveaxis(ref(Ad_ref[:-1]), 1, -1)
    xib = jnp.moveaxis(ref(xi_ref[:-1]), 1, -1)

    args = dict(
        qR=qR[:-1], qp=qp[:-1], qRn=qR[1:], qpn=qp[1:],
        xi=tl(xis)[:-1], xin=tl(xis)[1:], u=tl(us),
        RbiR=RbiR, Rbip=Rbip, Adb=Adb, xib=xib,
    )
    nu = us.shape[-1]
    lanes = lambda M: jnp.broadcast_to(
        jnp.asarray(M, dtp)[..., None], jnp.asarray(M).shape + (B,))
    if Pu is None:
        Pu = jnp.eye(6, dtype=dtp)
    if mg is None:
        mg = jnp.zeros((), dtp)
    consts = [lanes(Jm), lanes(Jinv), lanes(W1), lanes(W2), lanes(Pu),
              jnp.broadcast_to(jnp.asarray(mg, dtp), (1, B))]

    def spec(a):
        return pl.BlockSpec((1,) + a.shape[1:],
                            lambda i: (i,) + (0,) * (len(a.shape) - 1))

    in_specs = [spec(a) for a in args.values()] + \
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
    out_shapes = (
        jax.ShapeDtypeStruct((N, 3, 3, B), dtp),   # fqR
        jax.ShapeDtypeStruct((N, 3, B), dtp),      # fqp
        jax.ShapeDtypeStruct((N, 6, B), dtp),      # fxi
        jax.ShapeDtypeStruct((N, 12, B), dtp),     # d
        jax.ShapeDtypeStruct((N, 12, 12, B), dtp),  # Fx
        jax.ShapeDtypeStruct((N, 12, B), dtp),     # lx
        jax.ShapeDtypeStruct((N, 12, 12, B), dtp),  # lxx
        jax.ShapeDtypeStruct((N, 1, B), dtp),      # l
    )
    out_specs = tuple(spec(jnp.zeros(s.shape, dtp)) for s in out_shapes)

    kernel = functools.partial(_linearize_kernel, dt=float(dt),
                               gravity=gravity, exact_grav=exact_grav)
    fqR, fqp, fxi, d, Fx, lx, lxx, l = pl.pallas_call(
        kernel, grid=(N,), out_shape=out_shapes,
        in_specs=in_specs, out_specs=out_specs,
        interpret=interpret,
    )(*args.values(), *consts)

    bk = lambda x: jnp.moveaxis(x, -1, 0)
    fq = jnp.zeros((B, N, 4, 4), dtp)
    fq = fq.at[:, :, :3, :3].set(bk(fqR))
    fq = fq.at[:, :, :3, 3].set(bk(fqp))
    fq = fq.at[:, :, 3, 3].set(1.0)
    return dict(fq=fq, fxi=bk(fxi), d=bk(d), Fx=bk(Fx), lx=bk(lx),
                lxx=bk(lxx), l=bk(l)[..., 0])
