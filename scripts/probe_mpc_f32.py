"""Does the f32 flat-direction us noise matter in closed loop?  Run the
receding-horizon MPC in f32 and f64 and compare applied controls and plant
trajectories."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import dataclasses
from trajectory_optimization_matrix_lie_groups_tpu.solvers.mpc import make_closed_loop
from trajectory_optimization_matrix_lie_groups_tpu.tasks.parity import build_benchmark
from trajectory_optimization_matrix_lie_groups_tpu.ops import se3
import bench

H, T, ITERS = 40, 60, 6


def run(dtype):
    data, solver, params, x0, us0, _ = build_benchmark("se3_tracking", True)
    cfg = dataclasses.replace(solver.cfg, N=H, max_iterations=ITERS,
                              tol_grad_norm=0.0, tol_d_norm=0.0,
                              backward="sequential_fixed")
    from trajectory_optimization_matrix_lie_groups_tpu.solvers.lie_ilqr import LieILQR
    eng = LieILQR(solver.model, cfg)
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(dtype) if hasattr(x, "dtype") and
        jnp.issubdtype(x.dtype, jnp.floating) else x, t)
    params = cast(params)
    cp = params["cost"]
    q0 = jnp.asarray(np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_q0.npy")), dtype)
    xi0 = jnp.asarray(np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_xi0.npy")), dtype)
    loop = make_closed_loop(eng, T)
    out = loop(params, q0, xi0)
    return out, cp


out32, _ = run(jnp.float32)
out64, cp = run(jnp.float64)
du = np.max(np.abs(np.asarray(out32.us, np.float64) - np.asarray(out64.us)))
# pose error between the two closed-loop trajectories
e = se3.log(jnp.asarray(out32.qs, jnp.float64) @ se3.inverse(jnp.asarray(out64.qs, jnp.float64)))
dpose = float(np.max(np.abs(np.asarray(e))))
dxi = np.max(np.abs(np.asarray(out32.xis, np.float64) - np.asarray(out64.xis)))
# tracking error of each loop vs the reference path
ref = jnp.asarray(np.asarray(cp.q_ref)[: T + 1], jnp.float64)
track32 = float(np.max(np.abs(se3.log(jnp.asarray(out32.qs, jnp.float64) @ se3.inverse(ref)))))
track64 = float(np.max(np.abs(se3.log(jnp.asarray(out64.qs, jnp.float64) @ se3.inverse(ref)))))
print(f"applied-u    f32 vs f64 max err: {du:.3e}")
print(f"closed-loop pose  diff (log):    {dpose:.3e}")
print(f"closed-loop twist diff:          {dxi:.3e}")
print(f"tracking err vs ref  f32: {track32:.6f}   f64: {track64:.6f}")
