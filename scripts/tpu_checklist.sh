#!/bin/bash
# Post-tunnel-recovery validation sweep (run each with timeout; first
# compiles go through the remote compiler, 1-7 min each).
set -x
timeout 1800 python bench.py                      # headline (expect ~16.4k solves/s, f32 err ~1e-3, highprec 6.1e-5)
timeout 1200 python scripts/probe_al_tpu.py       # constrained pipeline throughput (new)
timeout 1200 python -m trajectory_optimization_matrix_lie_groups_tpu.tasks.run al_batch    # pipeline AL engine on chip
timeout 1200 python -m trajectory_optimization_matrix_lie_groups_tpu.tasks.run mpc_batch   # 237k MPC solves/s check
timeout 900  python -m trajectory_optimization_matrix_lie_groups_tpu.tasks.run dynamics_sim
