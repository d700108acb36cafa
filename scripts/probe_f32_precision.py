"""Where does the f32 us error come from?  Selectively run stages in f64."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from trajectory_optimization_matrix_lie_groups_tpu.solvers.batched import FastBatchSolver
from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3
import bench

GOLD = os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_us.npy")
us_golden = np.load(GOLD)
q0 = jnp.asarray(np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_q0.npy")))
xi0 = jnp.asarray(np.load(os.path.join(bench.GOLDEN_DIR, "bench_se3_n200_xi0.npy")))


class MixedSolver(FastBatchSolver):
    def __init__(self, *a, b64=False, keep64=False, roll64=False, **kw):
        self.b64 = b64; self.keep64 = keep64; self.roll64 = roll64
        super().__init__(*a, **kw)

    def _backward(self, lin):
        if not self.b64:
            return super()._backward(lin)
        lin64 = {kk: v.astype(jnp.float64) for kk, v in lin.items()}
        out = super()._backward(lin64)
        if self.keep64:
            return out
        return tuple(o.astype(jnp.float32) for o in out)

    def _rollout(self, params, lin, qs, xis, us, k, K):
        if not self.roll64:
            return self._rollout32(params, lin, qs, xis, us, k, K)
        c64 = lambda t: jax.tree.map(lambda x: x.astype(jnp.float64)
                                     if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
        qs2, xis2, us2 = super()._rollout(c64(params), c64(lin), c64(qs),
                                          c64(xis), c64(us), c64(k), c64(K))
        return (qs2.astype(jnp.float32), xis2.astype(jnp.float32),
                us2.astype(jnp.float32))

    _rollout32 = FastBatchSolver._rollout

    def _grad_norm(self, lin, Vx1, Vxx1):
        return super()._grad_norm(lin, Vx1, Vxx1).astype(jnp.float32)

    def _linearize(self, params, qs, xis, us):
        if not getattr(self, "lin64", False):
            return super()._linearize(params, qs, xis, us)
        c64 = lambda t: jax.tree.map(lambda x: x.astype(jnp.float64)
                                     if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x, t)
        lin = super()._linearize(c64(params), c64(qs), c64(xis), c64(us))
        return {kk: v.astype(jnp.float32) for kk, v in lin.items()}


def run(tag, **kw):
    model, params, _, _, q_ref, xi_ref = bench.build_problem(jnp.float32)
    N = q_ref.shape[0] - 1
    s = MixedSolver(model, N=N, iterations=12, use_pallas=False, **kw)
    out = s.solve(params, q0[None].astype(jnp.float32),
                  xi0[None].astype(jnp.float32),
                  jnp.zeros((1, N, 6), jnp.float32),
                  jnp.asarray(q_ref, jnp.float32), jnp.asarray(xi_ref, jnp.float32))
    err = float(np.max(np.abs(np.asarray(out.us[0], np.float64) - us_golden)))
    print(f"{tag:28s} us_max_err = {err:.3e}", flush=True)


def run64(iters):
    model, params, _, _, q_ref, xi_ref = bench.build_problem(jnp.float64)
    N = q_ref.shape[0] - 1
    s = FastBatchSolver(model, N=N, iterations=iters, use_pallas=False)
    out = s.solve(params, q0[None], xi0[None], jnp.zeros((1, N, 6)),
                  jnp.asarray(q_ref), jnp.asarray(xi_ref))
    err = float(np.max(np.abs(np.asarray(out.us[0]) - us_golden)))
    print(f"all f64 {iters} iters            us_max_err = {err:.3e}", flush=True)


run("pure f32")
def run_lin64():
    model, params, _, _, q_ref, xi_ref = bench.build_problem(jnp.float32)
    N = q_ref.shape[0] - 1
    s = MixedSolver(model, N=N, iterations=12, use_pallas=False)
    s.lin64 = True
    out = s.solve(params, q0[None].astype(jnp.float32),
                  xi0[None].astype(jnp.float32),
                  jnp.zeros((1, N, 6), jnp.float32),
                  jnp.asarray(q_ref, jnp.float32), jnp.asarray(xi_ref, jnp.float32))
    err = float(np.max(np.abs(np.asarray(out.us[0], np.float64) - us_golden)))
    print(f"linearize f64 only           us_max_err = {err:.3e}", flush=True)
run_lin64()
