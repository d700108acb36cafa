#!/usr/bin/env python
"""Headline benchmark: SE(3) tracking MPC solves/s/chip.

Workload (BASELINE.json metric): multiple-shooting SE(3) tracking iLQR at a
N=200 horizon (the drone-racing-slice scale,
`benchmark_drone_racing_tracking.py:47-58`), solved for a batch of perturbed
initial conditions — the reference's `perturb_all_compute.py` sweep workload
— on one TPU chip as a single vmapped jitted program.

Baseline: the reference itself cannot run here (manifpy/casadi are not
installed), and it publishes no numbers (BASELINE.md).  The `vs_baseline`
denominator is therefore a faithful stand-in: the serial per-stage
reference-style implementation (`tests/oracle_ms.py` — the same control flow
as `traopt_controller.py:iLQR_Tracking_SE3_MS`, one Python-loop stage at a
time) run on the host CPU, timed on the identical problem and iteration
budget.  Both sides run the same fixed iteration count.

Prints ONE JSON line:
  {"metric": ..., "value": solves_per_s_per_chip, "unit": "solves/s",
   "vs_baseline": speedup, ...extras}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax
import jax.numpy as jnp

from trajectory_optimization_matrix_lie_groups_tpu.models import costs, dynamics
from trajectory_optimization_matrix_lie_groups_tpu.models.base import make_model
from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3
from trajectory_optimization_matrix_lie_groups_tpu.solvers.lie_ilqr import (
    LieILQR,
    SolverConfig,
)
from trajectory_optimization_matrix_lie_groups_tpu.utils import load_benchmark_pickle

PKL = "/root/reference/visualization/results_benchmark_2nd_draft/results_se3_tracking_benchmark.pkl"
HORIZON = 200
ITERS = 12          # fixed budget for throughput runs (grad ~1e-6 at N=955)
BATCH = 256         # problems per chip
DTYPE = jnp.float32


def build_problem(dtype, horizon=HORIZON):
    data = load_benchmark_pickle(PKL)
    prob = data["prob"]
    q_ref = np.asarray(prob["q_ref"])[: horizon + 1]
    xi_ref = np.asarray(prob["xi_ref"])[: horizon + 1]
    dyn = dynamics.se3_dynamics()
    dp = dynamics.se3_params(jnp.asarray(prob["J"], dtype), float(prob["dt"]))
    dp = dp._replace(dt=jnp.asarray(float(prob["dt"]), dtype))
    cd = costs.tracking_cost(SE3, 6)
    cp = costs.tracking_cost_params(
        SE3,
        jnp.asarray(prob["Q"], dtype), jnp.asarray(prob["R"], dtype),
        jnp.asarray(prob["P"], dtype),
        jnp.asarray(q_ref, dtype), jnp.asarray(xi_ref, dtype),
    )
    model, params = make_model(dyn, cd, dp, cp)
    q0 = jnp.asarray(np.asarray(prob["x0"][0]), dtype)
    xi0 = jnp.asarray(np.asarray(prob["x0"][1]).reshape(6), dtype)
    return model, params, q0, xi0, q_ref, xi_ref


def perturbed_x0s(q0, xi0, batch, dtype, seed=0):
    """Perturbation-sweep initial conditions (perturb_all_compute.py-style)."""
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    dq = 0.05 * jax.random.normal(k1, (batch, 6), dtype=dtype)
    dxi = 0.05 * jax.random.normal(k2, (batch, 6), dtype=dtype)
    q0s = SE3.normalize(q0[None] @ SE3.exp(dq))
    xi0s = xi0[None] + dxi
    return q0s, xi0s


def main():
    model, params, q0, xi0, q_ref, xi_ref = build_problem(DTYPE)
    N = q_ref.shape[0] - 1
    cfg = SolverConfig(
        N=N, multiple_shooting=True, line_search=False, rollout="nonlinear",
        n_alphas=20, tol_grad_norm=0.0, tol_d_norm=0.0,  # fixed-iter budget
        max_iterations=ITERS,
    )
    solver = LieILQR(model, cfg)
    q0s, xi0s = perturbed_x0s(q0, xi0, BATCH, DTYPE)
    us0 = jnp.zeros((BATCH, N, 6), dtype=DTYPE)

    def solve_one(q0_, xi0_, us0_):
        st = solver._init_state_ms(q0_, xi0_, us0_, jnp.asarray(q_ref, DTYPE),
                                   jnp.asarray(xi_ref, DTYPE))
        return solver._solve_loop(params, st)

    solve_batch = jax.jit(jax.vmap(solve_one))

    # warm-up / compile
    out = solve_batch(q0s, xi0s, us0)
    jax.block_until_ready(out)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = solve_batch(q0s, xi0s, us0)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    solves_per_s = BATCH / dt
    ms_per_iter = dt / ITERS * 1e3

    # accuracy anchor: unperturbed f32 solve vs f64 ground truth on CPU
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model64, params64, q064, xi064, qr64, xr64 = build_problem(jnp.float64)
        solver64 = LieILQR(model64, cfg)
        st64 = solver64._init_state_ms(q064, xi064,
                                       jnp.zeros((N, 6), dtype=jnp.float64),
                                       jnp.asarray(qr64, jnp.float64),
                                       jnp.asarray(xr64, jnp.float64))
        ref_state = solver64._solve_jit(params64, st64)
    st32 = solve_batch(q0s.at[0].set(q0), xi0s.at[0].set(xi0), us0)
    us_err = float(jnp.max(jnp.abs(
        jnp.asarray(st32.us[0], jnp.float64) - ref_state.us)))

    # baseline: reference-style serial CPU implementation, same problem/budget
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    import oracle_ms as om
    with jax.default_device(cpu):
        qs_o = np.concatenate([np.asarray(q064)[None], qr64[1:]], axis=0)
        xis_o = np.concatenate([np.asarray(xi064)[None], xr64[1:]], axis=0)
        us_o = np.zeros((N, 6))
        mu_o, delta_o = 1.0, 2.0
        t0 = time.perf_counter()
        for _ in range(2):  # time 2 reference-style iterations, extrapolate
            lin = om.linearize(model64, params64, jnp.asarray(qs_o),
                               jnp.asarray(xis_o), jnp.asarray(us_o))
            d_o, Fx_o, Fu_o, L_o, Lx_o, Lu_o, Lxx_o, Lux_o, Luu_o = lin
            k_o, K_o, Vx_o, Vxx_o, mu_o, delta_o = om.backward(
                d_o, Fx_o, Fu_o, Lx_o, Lu_o, Lxx_o, Lux_o, Luu_o, mu_o, delta_o)
            qs_o, xis_o, us_o = om.rollout_nonlinear(
                model64, params64, jnp.asarray(qs_o), jnp.asarray(xis_o),
                jnp.asarray(us_o), k_o, K_o, d_o, 1.0)
        t_ref_iter = (time.perf_counter() - t0) / 2
    ref_solves_per_s = 1.0 / (t_ref_iter * ITERS)

    print(json.dumps({
        "metric": "SE3 tracking MS-iLQR MPC solves/s/chip (N=200, 12 iters, batch=256)",
        "value": round(solves_per_s, 3),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / ref_solves_per_s, 2),
        "ms_per_iter_batch": round(ms_per_iter, 3),
        "baseline_solves_per_s_serial_cpu": round(ref_solves_per_s, 4),
        "f32_vs_f64_us_max_err": us_err,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
