"""Multi-host scaling-efficiency harness (BASELINE >=80% 1->2 hosts).

Real 2-host TPU hardware is not reachable from this environment, so this
harness provides BOTH:

  1. the ready-to-run TPU measurement — the same worker invoked on each
     host against a coordinator (runbook below); and
  2. a CPU *proxy* measurement runnable here: weak scaling from 1 process
     (4 virtual devices) to 2 processes (4 virtual devices each, 8-device
     global mesh) with a FIXED per-device batch, exercising the actual
     multi-host code path (`jax.distributed` init, global mesh, per-process
     shard placement, cross-host result gather) end to end.

Efficiency := t_1proc / t_2proc at equal per-device work (1.0 = perfect
weak scaling).  Caveat, stated in the output: CPU processes share physical
cores, so the proxy measures the runtime/collective overhead of the
multi-host path, not ICI/DCN bandwidth — the workload is embarrassingly
parallel (independent MPC solves; DCN sees only result gathers), which is
exactly why >=80% is expected to hold on real hosts.

TPU runbook (2 hosts):
    host0$ python scripts/multihost_scaling.py --mode worker --tpu \
               --coordinator host0:8476 --nprocs 2 --pid 0
    host1$ python scripts/multihost_scaling.py --mode worker --tpu \
               --coordinator host0:8476 --nprocs 2 --pid 1
    (each prints its wall time; compare against a --mode single --tpu run
     on one host at the same per-device batch)

CPU proxy (this machine):
    python scripts/multihost_scaling.py
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PER_DEV_BATCH = 64
H, ITERS = 20, 4
REPS = 3


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _setup_platform(tpu: bool, ndev: int):
    if not tpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={ndev}"
            ).strip()
    import jax

    if not tpu:
        jax.config.update("jax_platforms", "cpu")
    return jax


def _workload(jax, mesh=None, nprocs=1, pid=0):
    """Fixed per-device batch sharded pipeline solve; returns wall seconds
    (post-warmup, result materialized)."""
    import numpy as np
    import jax.numpy as jnp

    from trajectory_optimization_matrix_lie_groups_tpu import parallel
    from trajectory_optimization_matrix_lie_groups_tpu.ops.group import SE3
    from trajectory_optimization_matrix_lie_groups_tpu.solvers.pipeline import (
        PallasPipelineSolver,
    )
    from trajectory_optimization_matrix_lie_groups_tpu.tasks.parity import (
        build_benchmark,
    )

    data, solver, params, x0, us0, _ = build_benchmark("se3_tracking", True)
    cp = params["cost"]
    cut = lambda a: a[: H + 1]
    cp = cp._replace(q_ref=cut(cp.q_ref), q_ref_inv=cut(cp.q_ref_inv),
                     Ad_ref=cut(cp.Ad_ref), xi_ref=cut(cp.xi_ref))
    dp = params["dyn"]

    ndev_global = len(jax.devices())
    B_global = PER_DEV_BATCH * ndev_global
    dq = 0.05 * jax.random.normal(jax.random.PRNGKey(42), (B_global, 6))
    q0s_all = np.asarray(SE3.normalize(cp.q_ref[0][None] @ SE3.exp(dq)))
    xi0s_all = np.broadcast_to(np.asarray(cp.xi_ref[0]), (B_global, 6))
    us0_all = np.zeros((B_global, H, 6))

    interp = jax.default_backend() != "tpu"
    pipe = PallasPipelineSolver(N=H, iterations=ITERS, dt=float(dp.dt),
                                interpret=interp)
    if mesh is None:
        mesh = parallel.global_batch_mesh()
    B_local = B_global // nprocs
    sl = slice(pid * B_local, (pid + 1) * B_local)
    q0s = parallel.distribute_batch(q0s_all[sl], mesh)
    xi0s = parallel.distribute_batch(xi0s_all[sl], mesh)
    us0 = parallel.distribute_batch(us0_all[sl], mesh)
    sharded = parallel.ShardedPipelineSolver(pipe, mesh)

    out = sharded.solve(dp, cp, q0s, xi0s, us0)   # warm-up + compile
    _ = np.asarray(parallel.gather_to_all(out.us[:, 0, :]))
    best = float("inf")
    for _rep in range(REPS):
        t0 = time.perf_counter()
        out = sharded.solve(dp, cp, q0s, xi0s, us0)
        _ = np.asarray(parallel.gather_to_all(out.us[:, 0, :]))
        best = min(best, time.perf_counter() - t0)
    return best


def run_single(args):
    jax = _setup_platform(args.tpu, 4)
    dt = _workload(jax)
    print(json.dumps(dict(mode="single", ndev=len(jax.devices()),
                          wall_s=round(dt, 4))), flush=True)


def run_worker(args):
    jax = _setup_platform(args.tpu, 4)
    from trajectory_optimization_matrix_lie_groups_tpu import parallel

    parallel.initialize_multihost(args.coordinator, args.nprocs, args.pid)
    mesh = parallel.global_batch_mesh()
    dt = _workload(jax, mesh=mesh, nprocs=args.nprocs, pid=args.pid)
    print(json.dumps(dict(mode="worker", pid=args.pid,
                          ndev=len(jax.devices()), wall_s=round(dt, 4))),
          flush=True)


def run_orchestrator(args):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # phase A: 1 process x 4 devices
    a = subprocess.run(
        [sys.executable, __file__, "--mode", "single"],
        capture_output=True, text=True, env=env, cwd=ROOT, timeout=900)
    if a.returncode != 0:
        print(a.stdout[-2000:], a.stderr[-2000:], file=sys.stderr)
        raise SystemExit("single-process phase failed")
    t1 = json.loads(a.stdout.strip().splitlines()[-1])["wall_s"]

    # phase B: 2 processes x 4 devices each
    coordinator = f"localhost:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--mode", "worker",
             "--coordinator", coordinator, "--nprocs", "2",
             "--pid", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=ROOT)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            print(out[-2000:], file=sys.stderr)
            raise SystemExit("worker phase failed")
    t2s = [json.loads(o.strip().splitlines()[-1])["wall_s"] for o in outs]
    t2 = max(t2s)  # job time = slowest process

    result = dict(
        task="multihost_scaling_proxy",
        per_device_batch=PER_DEV_BATCH, horizon=H, iters=ITERS,
        t_1proc_4dev_s=t1, t_2proc_8dev_s=t2, per_proc_s=t2s,
        # both processes share ONE machine's cores, so doubling the devices
        # doubles the compute on the same hardware: ideal proxy time is
        # 2*t1.  core_normalized_efficiency = 2*t1/t2 isolates the
        # multi-host RUNTIME overhead (distributed init held out; shard
        # placement, collectives, gathers included) — the quantity that
        # would erode <100% scaling on real separate hosts, where the
        # raw_efficiency column would then apply with ideal t2 = t1.
        core_normalized_efficiency=round(2.0 * t1 / t2, 3),
        raw_efficiency_shared_cores=round(t1 / t2, 3),
        note=("CPU proxy on shared cores; measures the multi-host runtime "
              "path (jax.distributed + global mesh + shard placement + "
              "cross-process gather), not DCN bandwidth.  See module "
              "docstring for the real 2-host TPU invocation."),
    )
    print(json.dumps(result))
    from trajectory_optimization_matrix_lie_groups_tpu.utils.records import (
        record,
    )
    record("multihost_scaling_proxy", result)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("orchestrate", "single", "worker"),
                    default="orchestrate")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--tpu", action="store_true",
                    help="use the real backend (no virtual CPU devices)")
    args = ap.parse_args()
    if args.mode == "single":
        run_single(args)
    elif args.mode == "worker":
        run_worker(args)
    else:
        run_orchestrator(args)


if __name__ == "__main__":
    main()
