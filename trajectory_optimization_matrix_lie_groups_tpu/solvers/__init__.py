"""Trajectory-optimization solvers (scan/vmap-structured, jit-compiled)."""

from trajectory_optimization_matrix_lie_groups_tpu.solvers.lie_ilqr import (  # noqa: F401
    LieILQR,
    SolverConfig,
    SolverState,
)

from trajectory_optimization_matrix_lie_groups_tpu.solvers.al_ilqr import ALILQR  # noqa: F401
from trajectory_optimization_matrix_lie_groups_tpu.solvers.al_pipeline import (  # noqa: F401
    ALPipelineSolver,
    al_polish,
)
from trajectory_optimization_matrix_lie_groups_tpu.solvers.df_mixed import MixedDFPipelineSolver  # noqa: F401
from trajectory_optimization_matrix_lie_groups_tpu.solvers.df_pipeline import DFPipelineSolver  # noqa: F401
from trajectory_optimization_matrix_lie_groups_tpu.solvers.batched import FastBatchSolver  # noqa: F401
from trajectory_optimization_matrix_lie_groups_tpu.solvers.ilqr import ILQR, ILQRConfig  # noqa: F401
from trajectory_optimization_matrix_lie_groups_tpu.solvers.pipeline import PallasPipelineSolver  # noqa: F401
from trajectory_optimization_matrix_lie_groups_tpu.solvers.polish import HighPrecisionSolver  # noqa: F401
