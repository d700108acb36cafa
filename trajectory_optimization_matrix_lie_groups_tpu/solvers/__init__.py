"""Trajectory-optimization solvers (scan/vmap-structured, jit-compiled)."""

from trajectory_optimization_matrix_lie_groups_tpu.solvers.lie_ilqr import (  # noqa: F401
    LieILQR,
    SolverConfig,
    SolverState,
)
