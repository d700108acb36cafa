#!/bin/bash
# Post-tunnel-recovery validation sweep (run each with timeout; first
# compiles go through the remote compiler, 1-7 min each).
set -x
timeout 1800 python bench.py                      # headline (round 5: gate-passing ~27k, f32 ~36k, drone ~30k, highprec 6.1e-5)
timeout 1200 python scripts/probe_al_tpu.py       # constrained pipeline throughput (new)
timeout 1200 python -m trajectory_optimization_matrix_lie_groups_tpu.tasks.run al_batch    # pipeline AL engine on chip
timeout 1200 python -m trajectory_optimization_matrix_lie_groups_tpu.tasks.run mpc_batch   # ~555k MPC solves/s check (packed)
timeout 900  python -m trajectory_optimization_matrix_lie_groups_tpu.tasks.run dynamics_sim
