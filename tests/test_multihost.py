"""Multi-process (multi-host analog) runtime: 2 CPU processes x 4 virtual
devices form an 8-device global mesh; the sharded pipeline solve must
reproduce the single-process result exactly (see scripts/multihost_worker.py).
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.multidevice

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_solve():
    coordinator = f"localhost:{_free_port()}"
    nprocs = 2
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(ROOT, "scripts", "multihost_worker.py"),
             coordinator, str(nprocs), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=ROOT)
        for pid in range(nprocs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    assert "MULTIHOST_OK" in outs[0], outs[0][-3000:]
