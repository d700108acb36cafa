"""Inequality constraints g(x, u) <= 0.

Replaces `traoptlibrary/traopt_constraints.py`: the ABC becomes a
`ConstraintDef` namespace of pure functions; `InputConstraint` (box bounds on
the input, ref traopt_constraints.py:66-169) is the one concrete family the
reference ships.
"""

from typing import Callable, NamedTuple

import jax.numpy as jnp


class ConstraintDef(NamedTuple):
    constr_size: int
    g: Callable    # (params, q, xi, u, i, terminal) -> (..., c)
    g_x: Callable  # (params, q, xi, u, i, terminal) -> (..., c, nx)
    g_u: Callable  # (params, q, xi, u, i, terminal) -> (..., c, nu)


class InputBoxParams(NamedTuple):
    lb: jnp.ndarray  # (nu,)
    ub: jnp.ndarray  # (nu,)


def input_box_params(lb, ub, nu):
    # array inputs keep their dtype (an f32 MPC program must not pick up
    # f64 bounds under x64); python scalars take the default float
    dt = jnp.result_type(jnp.asarray(lb), jnp.asarray(ub))
    if not jnp.issubdtype(dt, jnp.floating):
        dt = jnp.result_type(float)
    lb = jnp.broadcast_to(jnp.asarray(lb, dtype=dt), (nu,))
    ub = jnp.broadcast_to(jnp.asarray(ub, dtype=dt), (nu,))
    return InputBoxParams(lb=lb, ub=ub)


def input_box(nx: int, nu: int) -> ConstraintDef:
    """g = [lb - u; u - ub] <= 0; terminal g = 0 (ref traopt_constraints.py:127-133)."""
    c = 2 * nu

    def g(p: InputBoxParams, q, xi, u, i, terminal=False):
        val = jnp.concatenate([p.lb - u, u - p.ub], axis=-1)
        if isinstance(terminal, bool):
            return jnp.zeros_like(val) if terminal else val
        return jnp.where(terminal, jnp.zeros_like(val), val)

    def g_x(p, q, xi, u, i, terminal=False):
        return jnp.zeros((*u.shape[:-1], c, nx), dtype=u.dtype)

    def g_u(p, q, xi, u, i, terminal=False):
        eye = jnp.eye(nu, dtype=u.dtype)
        J = jnp.concatenate([-eye, eye], axis=0)
        J = jnp.broadcast_to(J, (*u.shape[:-1], c, nu))
        if isinstance(terminal, bool) and terminal:
            return jnp.zeros_like(J)
        return J

    return ConstraintDef(constr_size=c, g=g, g_x=g_x, g_u=g_u)
