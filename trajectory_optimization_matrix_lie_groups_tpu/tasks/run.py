"""Task runner: the reference's `main_*.py` scripts as one CLI.

Usage:
    python -m trajectory_optimization_matrix_lie_groups_tpu.tasks.run <task> [--plot DIR]

Tasks mirror the reference scripts:
    cartpole            main_ddp.py
    so3_tracking        main_SO3ddp_tracking_exact.py (SS)
    so3_tracking_ms     main_SO3ddp_tracking_exact_ms.py (MS)
    pendulum3d_ms       main_pendulum3d_ddp_tracking_exact_ms.py
    se3_tracking        main_SE3ddp_tracking_exact.py (SS)
    se3_tracking_ms     main_SE3ddp_tracking_exact_ms.py (MS)
    drone_ms            main_drone_ddp_tracking_exact_ms.py
    se3_al_ms           main_SE3ddp_tracking_exact_al_ms.py (input box +-10)
    errstate_generate   main_errSE3ddp_nonlinear_rollout_generation.py
    sweep               visualization/perturb_all_compute.py (reduced ranges)

Benchmark problems are rebuilt from the reference pickles where available;
the AL and error-state tasks use the reference script constants.
"""

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _summary(name, J_hist, grad_hist, state=None, extra=None):
    out = dict(task=name, iterations=len(J_hist),
               J_first=J_hist[0] if J_hist else None,
               J_final=J_hist[-1] if J_hist else None,
               grad_final=grad_hist[-1] if grad_hist else None)
    if state is not None and hasattr(state, "converged"):
        out["converged"] = bool(state.converged)
    if extra:
        out.update(extra)
    print(json.dumps(out))
    return out


def run_cartpole(args):
    from trajectory_optimization_matrix_lie_groups_tpu.tasks import cartpole

    xs, us, J_hist, grad_hist, state = cartpole.run(n_iterations=200)
    res = _summary("cartpole", J_hist, grad_hist, state,
                   {"final_state": np.asarray(xs[-1]).tolist()})
    if args.plot:
        from trajectory_optimization_matrix_lie_groups_tpu.viz import plots

        plots.convergence(J_hist, grad_hist, f"{args.plot}/cartpole_convergence.png")
    return res


def run_benchmark_task(name, bench_name, ms, args):
    from trajectory_optimization_matrix_lie_groups_tpu.tasks.parity import (
        build_benchmark,
    )

    data, solver, params, x0, us0, sol_key = build_benchmark(bench_name, ms)
    t0 = time.perf_counter()
    (qs, xis), us, J_hist, grad_hist, defect_hist, state = solver.fit(params, x0, us0)
    wall = time.perf_counter() - t0
    us_ref = np.asarray(data[sol_key]["us"])
    err = float(np.max(np.abs(np.asarray(us) - us_ref)))
    res = _summary(name, J_hist, grad_hist, state,
                   {"wall_s": round(wall, 2), "us_vs_reference_max_err": err})
    if args.plot:
        from trajectory_optimization_matrix_lie_groups_tpu.viz import plots

        plots.convergence(J_hist, grad_hist, f"{args.plot}/{name}_convergence.png",
                          defect_hist=defect_hist)
        plots.trajectory_3d(np.asarray(qs), np.asarray(params["cost"].q_ref),
                            f"{args.plot}/{name}_trajectory.png")
    return res


def run_al(args):
    import dataclasses

    from trajectory_optimization_matrix_lie_groups_tpu.models import (
        constraints as cs,
        costs,
    )
    from trajectory_optimization_matrix_lie_groups_tpu.models.base import make_model
    from trajectory_optimization_matrix_lie_groups_tpu.models import dynamics
    from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3
    from trajectory_optimization_matrix_lie_groups_tpu.solvers.al_ilqr import ALILQR
    from trajectory_optimization_matrix_lie_groups_tpu.solvers.lie_ilqr import (
        LieILQR,
        SolverConfig,
    )
    from trajectory_optimization_matrix_lie_groups_tpu.tasks.parity import (
        build_benchmark,
    )

    data, solver0, params0, x0, us0, _ = build_benchmark("se3_tracking", True)
    prob = data["prob"]
    H = 200
    q_ref = jnp.asarray(np.asarray(prob["q_ref"])[: H + 1])
    xi_ref = jnp.asarray(np.asarray(prob["xi_ref"])[: H + 1])
    dyn = dynamics.se3_dynamics()
    dp = dynamics.se3_params(jnp.asarray(prob["J"]), float(prob["dt"]))
    cd = costs.tracking_cost(SE3, 6)
    cp = costs.tracking_cost_params(SE3, prob["Q"], prob["R"], prob["P"],
                                    q_ref, xi_ref)
    constr = cs.input_box(12, 6)
    constr_p = cs.input_box_params(-100.0, 100.0, 6)
    al_cd = costs.al_cost(cd, constr)
    model_c, _ = make_model(dyn, al_cd, dp, None)
    alp = costs.al_init_params(cp, constr_p, H, constr.constr_size, mu0=1e-2)
    cfg = SolverConfig(N=H, multiple_shooting=True, rollout="nonlinear",
                       tol_grad_norm=1e-8, max_iterations=100)
    inner = LieILQR(model_c, cfg)
    al = ALILQR(inner, constr, tol_constr=1e-2)
    q0 = SE3.normalize(q_ref[0] @ SE3.exp(jnp.asarray([0.02, -0.01, 0.03, 0.05, -0.02, 0.01])))
    xi0 = xi_ref[0] + 0.05
    res = al.fit({"dyn": dp, "cost": alp}, (q0, xi0), jnp.zeros((H, 6)),
                 n_al_iters=20, n_ilqr_iters=100)
    print(json.dumps(dict(
        task="se3_al_ms", outer_iterations=res.outer_iterations,
        constr_converged=bool(res.constr_converged),
        max_violation=float(jnp.max(res.constr_eval)),
        u_range=[float(jnp.min(res.us)), float(jnp.max(res.us))],
    )))


def run_errstate(args):
    from trajectory_optimization_matrix_lie_groups_tpu.models import errorstate as es
    from trajectory_optimization_matrix_lie_groups_tpu.ops import se3
    from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3
    from trajectory_optimization_matrix_lie_groups_tpu.solvers.errorstate_ilqr import (
        ErrorStateILQR,
        ESConfig,
    )

    N, dt = 400, 0.01
    J = jnp.block([
        [jnp.diag(jnp.array([0.5, 0.7, 0.9])), jnp.zeros((3, 3))],
        [jnp.zeros((3, 3)), jnp.eye(3)],
    ])
    R_goal = SE3.exp(jnp.array([0.0, 0.0, jnp.pi / 4, 0.0, 0.0, 0.0]))
    X_goal = R_goal.at[:3, 3].set(jnp.array([10.0, 10.0, 10.0]))
    q0 = jnp.eye(4)
    xi0 = jnp.concatenate([
        jnp.array([jnp.pi / 4, jnp.pi / 4, jnp.pi / 2]) / (N * dt),
        jnp.array([11.0, 11.0, 9.0]) / (N * dt),
    ])
    us0 = jnp.zeros((N, 6))
    p0 = es.errorstate_params(J, dt, jnp.zeros((N + 1, 4, 4)), jnp.zeros((N + 1, 6)))
    qs, xis = es.rollout_nominal(p0, q0, xi0, us0)
    params = es.reanchor(p0, qs, xis)
    Q, P, Rm = jnp.eye(6), 1e7 * jnp.eye(6), 1e3 * jnp.eye(6)
    cp = es.goal_cost_params(Q, Rm, P, params.q_ref, X_goal)
    cfg = ESConfig(N=N, mode="generation_nonlinear", n_alphas=15,
                   tol_grad_norm=1e-3, max_iterations=100)
    solver = ErrorStateILQR(cfg, es.goal_cost,
                            reanchor_cost=lambda c, qs_new: es.goal_cost_params(
                                Q, Rm, P, qs_new, X_goal))
    state, J_hist, grad_hist, _ = solver.fit(cp, params, us0)
    final_err = se3.log(se3.inverse(state.qs[-1]) @ X_goal)
    _summary("errstate_generate", J_hist, grad_hist, state,
             {"final_goal_err_norm": float(jnp.linalg.norm(final_err))})


def run_sweep_task(args):
    import dataclasses

    from trajectory_optimization_matrix_lie_groups_tpu.parallel import (
        BatchSolver,
        make_batch_mesh,
    )
    from trajectory_optimization_matrix_lie_groups_tpu.parallel.sweep import run_sweep
    from trajectory_optimization_matrix_lie_groups_tpu.solvers.lie_ilqr import LieILQR
    from trajectory_optimization_matrix_lie_groups_tpu.tasks.parity import (
        build_benchmark,
    )

    data, solver, params, x0, us0, _ = build_benchmark("se3_tracking", True)
    cfg = dataclasses.replace(solver.cfg, N=200, max_iterations=10,
                              tol_grad_norm=0.0, tol_d_norm=0.0,
                              backward="sequential_fixed")
    solver = LieILQR(solver.model, cfg)
    cp = params["cost"]
    cut = lambda a: a[:201]
    params = {**params, "cost": cp._replace(
        q_ref=cut(cp.q_ref), q_ref_inv=cut(cp.q_ref_inv),
        Ad_ref=cut(cp.Ad_ref), xi_ref=cut(cp.xi_ref))}
    mesh = make_batch_mesh()
    bs = BatchSolver(solver, mesh=mesh)
    ranges = {
        "w_z": np.arange(-1.0, 1.0, 0.05) + 1.0,
        "p_x": np.arange(-8.0, 8.0, 0.4),
        "v_x": np.arange(-4.0, 4.0, 0.2),
        "th_z": np.arange(-30.0, 30.0, 1.5),
    }
    t0 = time.perf_counter()
    out = run_sweep(bs, params, ranges, cp.q_ref[0], cp.xi_ref[0], nu=6)
    wall = time.perf_counter() - t0
    total = sum(len(v.values) for v in out.values())
    print(json.dumps(dict(task="sweep", n_solves=total, wall_s=round(wall, 2),
                          solves_per_s=round(total / wall, 1),
                          params={k: dict(n=len(v.values),
                                          J_min=float(v.J_opt.min()),
                                          J_max=float(v.J_opt.max()))
                                  for k, v in out.items()})))


TASKS = {
    "cartpole": run_cartpole,
    "so3_tracking": lambda a: run_benchmark_task("so3_tracking", "so3_tracking", False, a),
    "so3_tracking_ms": lambda a: run_benchmark_task("so3_tracking_ms", "so3_tracking", True, a),
    "pendulum3d_ms": lambda a: run_benchmark_task("pendulum3d_ms", "pendulum_swingup", True, a),
    "se3_tracking": lambda a: run_benchmark_task("se3_tracking", "se3_tracking", False, a),
    "se3_tracking_ms": lambda a: run_benchmark_task("se3_tracking_ms", "se3_tracking", True, a),
    "drone_ms": lambda a: run_benchmark_task("drone_ms", "drone_racing", True, a),
    "se3_al_ms": run_al,
    "errstate_generate": run_errstate,
    "sweep": run_sweep_task,
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("task", choices=sorted(TASKS))
    ap.add_argument("--plot", default=None, help="directory for output figures")
    ap.add_argument("--x64", action="store_true", help="enable float64")
    args = ap.parse_args(argv)
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    if args.plot:
        import os

        os.makedirs(args.plot, exist_ok=True)
    TASKS[args.task](args)


if __name__ == "__main__":
    main()
