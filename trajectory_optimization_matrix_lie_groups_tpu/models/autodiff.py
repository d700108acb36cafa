"""Autodiff-derived dynamics and costs for Euclidean-state problems.

Replaces the reference's `AutoDiffDynamics` (traopt_dynamics.py:133-273) and
`AutoDiffCost` (traopt_cost.py:113-274): the user supplies a discrete step
`f(x, u, i)` and scalar costs `l(x, u, i)` / `l_terminal(x, i)` as jnp
functions; Jacobians/Hessians come from jacfwd/hessian and are fused into the
solver's batched linearization (the reference jits each derivative
separately and calls them one stage at a time).
"""

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class EuclideanModel(NamedTuple):
    """Vector-state model bundle for the Euclidean iLQR/DDP solver.

    All callables take per-stage (batched via vmap inside the solver):
      step:       (x, u, i) -> x_next
      jac:        (x, u, i) -> (fx, fu)
      hess:       (x, u, i) -> (fxx, fux, fuu)  (None unless hessians)
      stage_quad: (x, u, i) -> (l, lx, lu, lxx, lux, luu)
      term_quad:  (x, i)    -> (l, lx, lxx)
    """

    nx: int
    nu: int
    step: Callable
    jac: Callable
    hess: Callable
    stage_cost: Callable
    term_cost: Callable
    stage_quad: Callable
    term_quad: Callable
    has_hessians: bool


def autodiff_model(f, l, l_terminal, state_size, action_size, hessians=False):
    """Build an EuclideanModel from user f/l/l_terminal (jnp functions)."""

    def jac(x, u, i):
        return jax.jacfwd(f, argnums=0)(x, u, i), jax.jacfwd(f, argnums=1)(x, u, i)

    def hess(x, u, i):
        fxx = jax.jacfwd(jax.jacfwd(f, argnums=0), argnums=0)(x, u, i)
        fux = jax.jacfwd(jax.jacfwd(f, argnums=1), argnums=0)(x, u, i)
        fuu = jax.jacfwd(jax.jacfwd(f, argnums=1), argnums=1)(x, u, i)
        return fxx, fux, fuu

    def stage_quad(x, u, i):
        lv = l(x, u, i)
        lx = jax.grad(l, argnums=0)(x, u, i)
        lu = jax.grad(l, argnums=1)(x, u, i)
        lxx = jax.hessian(l, argnums=0)(x, u, i)
        lux = jax.jacfwd(jax.grad(l, argnums=1), argnums=0)(x, u, i)
        luu = jax.hessian(l, argnums=1)(x, u, i)
        return lv, lx, lu, lxx, lux, luu

    def term_quad(x, i):
        lv = l_terminal(x, i)
        lx = jax.grad(l_terminal, argnums=0)(x, i)
        lxx = jax.hessian(l_terminal, argnums=0)(x, i)
        return lv, lx, lxx

    return EuclideanModel(
        nx=state_size, nu=action_size, step=f, jac=jac, hess=hess,
        stage_cost=l, term_cost=l_terminal, stage_quad=stage_quad,
        term_quad=term_quad, has_hessians=hessians,
    )


def rk4(fc, dt):
    """RK4 discretization of a continuous f(x, u) (ref main_ddp.py:58-66)."""

    def step(x, u, i):
        del i
        s1 = fc(x, u)
        s2 = fc(x + dt / 2 * s1, u)
        s3 = fc(x + dt / 2 * s2, u)
        s4 = fc(x + dt * s3, u)
        return x + dt / 6 * (s1 + 2 * s2 + 2 * s3 + s4)

    return step
