"""Pallas batched-Riccati kernel vs the associative/sequential references.

On CPU the kernel runs in interpreter mode; on TPU it compiles for real
(exercised by bench/TPU runs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajectory_optimization_matrix_lie_groups_tpu.ops.pallas_riccati import (
    pallas_backward,
)
from trajectory_optimization_matrix_lie_groups_tpu.solvers import riccati


def _random_problem(key, B, N):
    ks = jax.random.split(key, 8)
    Fx = 0.1 * jax.random.normal(ks[0], (B, N, 12, 12)) + jnp.eye(12)
    Fu = 0.1 * jax.random.normal(ks[1], (B, N, 12, 6))
    d = 0.01 * jax.random.normal(ks[2], (B, N, 12))
    Lx = jax.random.normal(ks[3], (B, N + 1, 12))
    Lu = jax.random.normal(ks[4], (B, N, 6))
    W = jax.random.normal(ks[5], (B, N + 1, 12, 12))
    Lxx = W @ jnp.swapaxes(W, -1, -2) * 0.1 + jnp.eye(12)
    Lux = 0.1 * jax.random.normal(ks[6], (B, N, 6, 12))
    U = jax.random.normal(ks[7], (B, N, 6, 6))
    Luu = U @ jnp.swapaxes(U, -1, -2) * 0.1 + jnp.eye(6)
    return Fx, Fu, d, Lx, Lu, Lxx, Lux, Luu


@pytest.mark.slow
def test_pallas_matches_parallel_backward():
    args = _random_problem(jax.random.PRNGKey(0), B=4, N=12)
    interpret = jax.default_backend() != "tpu"
    k_p, K_p, Vx_p, Vxx_p = pallas_backward(*args, interpret=interpret)
    k_r, K_r, Vx_r, Vxx_r = jax.vmap(
        lambda *a: riccati.parallel_backward(*a, mu=0.0))(*args)
    np.testing.assert_allclose(np.asarray(k_p), np.asarray(k_r), atol=1e-10)
    np.testing.assert_allclose(np.asarray(K_p), np.asarray(K_r), atol=1e-10)
    np.testing.assert_allclose(np.asarray(Vx_p), np.asarray(Vx_r), atol=1e-9)
    np.testing.assert_allclose(np.asarray(Vxx_p), np.asarray(Vxx_r), atol=1e-9)


@pytest.mark.slow
def test_pallas_batch_tile():
    """2D (batch_tile, stage) grid gives identical results to the full-batch
    grid; each tile re-initializes the VMEM value-function carry."""
    args = _random_problem(jax.random.PRNGKey(3), B=6, N=9)
    interpret = jax.default_backend() != "tpu"
    full = pallas_backward(*args, interpret=interpret)
    tiled = pallas_backward(*args, interpret=interpret, batch_tile=2)
    for a, b in zip(full, tiled):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


@pytest.mark.parity
def test_pallas_backward_so3_family():
    """nx=6 instantiation (SO(3) family): kernel path == XLA scan path."""
    import jax

    from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SO3
    from trajectory_optimization_matrix_lie_groups_tpu.solvers.batched import (
        FastBatchSolver,
    )
    from trajectory_optimization_matrix_lie_groups_tpu.tasks.parity import (
        build_benchmark,
        cut_reference,
    )

    H, ITERS, B = 20, 5, 4
    data, solver, params, x0, us0, _ = build_benchmark("so3_tracking", True,
                                                       dtype=jnp.float32)
    params = cut_reference(params, H)
    cp = params["cost"]
    dq = 0.05 * jax.random.normal(jax.random.PRNGKey(5), (B, 3), jnp.float32)
    q0s = SO3.normalize(cp.q_ref[0][None] @ SO3.exp(dq))
    xi0s = jnp.broadcast_to(cp.xi_ref[0], (B, 3))
    us0b = jnp.zeros((B, H, 3), jnp.float32)

    xla = FastBatchSolver(solver.model, N=H, iterations=ITERS,
                          use_pallas=False)
    ker = FastBatchSolver(solver.model, N=H, iterations=ITERS,
                          use_pallas=True,
                          interpret=jax.default_backend() != "tpu")
    a = xla.solve(params, q0s, xi0s, us0b, cp.q_ref, cp.xi_ref)
    b = ker.solve(params, q0s, xi0s, us0b, cp.q_ref, cp.xi_ref)
    np.testing.assert_allclose(np.asarray(b.us), np.asarray(a.us), atol=3e-5)
    np.testing.assert_allclose(np.asarray(b.J_opt), np.asarray(a.J_opt),
                               rtol=2e-5)
