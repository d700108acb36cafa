"""Parallel-prefix (associative-scan) Riccati backward pass.

The reference's backward pass is a strictly sequential per-stage recursion
(`traopt_controller.py:1637-1694`).  Here the value-function recursion is
reformulated as an associative combination of per-stage *conditional
value-function elements* (the dual parameterization of Sarkka &
Garcia-Fernandez, "Temporal Parallelization of Dynamic Programming and
Linear Quadratic ...", generalized to cross terms l_ux, linear control cost
l_u, and multiple-shooting defects), so `lax.associative_scan` computes all
V_i in O(log N) depth of large batched 12x12 ops — the TPU-native shape of
the Riccati sweep.

Element e = (A, b, C, eta, Jm) represents the segment cost-to-go
    S(x, z) = max_lam [ lam^T (z - A x - b) - 1/2 lam^T C lam ]
              + 1/2 x^T Jm x - eta^T x    (+ const),
with stage leaf (eliminating u from  l(x,u) + [z = Fx x + Fu u + d]):
    A  = Fx - Fu Luu^-1 Lux          b  = d - Fu Luu^-1 Lu
    C  = Fu Luu^-1 Fu^T              Jm = Lxx - Lux^T Luu^-1 Lux
    eta = Lux^T Luu^-1 Lu - Lx
and terminal element (0, 0, 0, -LxN, LxxN).  The suffix combination from
stage i yields V_i(dx) = 1/2 dx^T Jm dx - eta^T dx, i.e. Vx_i = -eta_i,
Vxx_i = Jm_i; gains then come from the standard Q-quantities in one batched
solve over all stages.

This is the mu = 0 recursion: the reference's per-step adaptive
Levenberg-Marquardt retry is inherently sequential, so the parallel mode
applies a *fixed* regularization (config `mu`) uniformly instead.  Both
modes share the same fixed point; parity tests pin the sequential mode,
performance tests the parallel one.
"""

import jax.numpy as jnp
from jax import lax


def _bmv(M, v):
    return jnp.einsum("...ij,...j->...i", M, v)


def _solve(M, B):
    return jnp.linalg.solve(M, B)


def build_elements(Fx, Fu, d, Lx, Lu, Lxx, Lux, Luu, mu=0.0):
    """Per-stage elements + terminal element, stacked along axis 0.

    Shapes: Fx (N,n,n), Fu (N,n,m), d (N,n), Lx (N+1,n), Lu (N,m),
    Lxx (N+1,n,n), Lux (N,m,n), Luu (N,m,m).
    """
    n = Fx.shape[-1]
    LuuR = Luu + mu * jnp.einsum("nji,njk->nik", Fu, Fu)  # mu fuT fu (LM style)
    Ui_Lux = _solve(LuuR, Lux)                 # Luu^-1 Lux  (N,m,n)
    Ui_Lu = _solve(LuuR, Lu[..., None])[..., 0]  # (N,m)
    Ui_FuT = _solve(LuuR, jnp.swapaxes(Fu, -1, -2))  # (N,m,n)
    LuxT = jnp.swapaxes(Lux, -1, -2)

    A = Fx - Fu @ Ui_Lux
    b = d - _bmv(Fu, Ui_Lu)
    C = Fu @ Ui_FuT
    Jm = Lxx[:-1] - LuxT @ Ui_Lux
    eta = _bmv(LuxT, Ui_Lu) - Lx[:-1]

    # terminal element
    zN = jnp.zeros((1, n, n), dtype=Fx.dtype)
    A = jnp.concatenate([A, zN], axis=0)
    b = jnp.concatenate([b, jnp.zeros((1, n), dtype=Fx.dtype)], axis=0)
    C = jnp.concatenate([C, zN], axis=0)
    eta = jnp.concatenate([eta, -Lx[-1:]], axis=0)
    Jm = jnp.concatenate([Jm, Lxx[-1:]], axis=0)
    return A, b, C, eta, Jm


def combine(e_earlier, e_later):
    """Associative combination (earlier segment, later segment)."""
    A1, b1, C1, eta1, J1 = e_earlier
    A2, b2, C2, eta2, J2 = e_later
    n = A1.shape[-1]
    I = jnp.eye(n, dtype=A1.dtype)
    # (I + C1 J2)^-1 applied from the left
    M = I + C1 @ J2
    Minv_A1 = _solve(M, A1)
    Minv_bC = _solve(M, (b1 + _bmv(C1, eta2))[..., None])[..., 0]
    Minv_C1 = _solve(M, C1)
    # (I + J2 C1)^-1 applied from the left
    Mt = I + J2 @ C1
    Mtinv = _solve(Mt, jnp.broadcast_to(I, Mt.shape))
    A1T = jnp.swapaxes(A1, -1, -2)

    A = A2 @ Minv_A1
    b = _bmv(A2, Minv_bC) + b2
    C = A2 @ Minv_C1 @ jnp.swapaxes(A2, -1, -2) + C2
    eta = _bmv(A1T @ Mtinv, eta2 - _bmv(J2, b1)) + eta1
    J = A1T @ Mtinv @ J2 @ A1 + J1
    J = 0.5 * (J + jnp.swapaxes(J, -1, -2))
    return A, b, C, eta, J


def parallel_backward(Fx, Fu, d, Lx, Lu, Lxx, Lux, Luu, mu=0.0):
    """All-stage gains and value functions via associative scan.

    Returns (k, K, Vx_next, Vxx_next) matching the sequential backward's
    outputs: Vx_next[i] = V_x at stage i+1 (the quantity the gradient and
    gains use).
    """
    elems = build_elements(Fx, Fu, d, Lx, Lu, Lxx, Lux, Luu, mu)
    # Under reverse=True, associative_scan feeds the operator
    # (later-accumulated, earlier) — flip into our (earlier, later) combine.
    suffix = lax.associative_scan(lambda a, b: combine(b, a), elems,
                                  reverse=True, axis=0)
    _, _, _, eta_s, J_s = suffix
    Vx = -eta_s      # (N+1, n)
    Vxx = J_s        # (N+1, n, n)
    Vx_next = Vx[1:]
    Vxx_next = Vxx[1:]

    # batched gains from V_{i+1} (reference _Q with fixed mu)
    fuT = jnp.swapaxes(Fu, -1, -2)
    n = Fx.shape[-1]
    eye = jnp.eye(n, dtype=Fx.dtype)
    Vreg = Vxx_next + mu * eye
    Vmod = Vx_next + _bmv(Vxx_next, d)
    Qu = Lu + _bmv(fuT, Vmod)
    Qux = Lux + fuT @ Vreg @ Fx
    Quu = Luu + fuT @ Vreg @ Fu
    k = -_solve(Quu, Qu[..., None])[..., 0]
    K = -_solve(Quu, Qux)
    return k, K, Vx_next, Vxx_next
