"""Smoke tests for the task-runner CLI (fast tasks only)."""

import json

import pytest

from trajectory_optimization_matrix_lie_groups_tpu.tasks.run import main


@pytest.mark.parity
def test_cli_drone_ms(capsys):
    main(["drone_ms"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["converged"]
    assert out["us_vs_reference_max_err"] < 1e-4


@pytest.mark.parity
def test_cli_pendulum_ms(capsys):
    main(["pendulum3d_ms"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["converged"]
    assert out["us_vs_reference_max_err"] < 1e-4
