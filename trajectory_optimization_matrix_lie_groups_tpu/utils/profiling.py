"""Profiling helpers — the TPU-native analog of the reference's
`run_profiler.py` (cProfile wrapper) and per-phase `perf_counter` prints
(`traopt_controller.py:135-137,641-660`).
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir="/tmp/traopt_trace"):
    """Capture a jax.profiler device trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Wall-clock phase timer with device sync (replaces the reference's
    inline perf_counter prints with structured records)."""

    def __init__(self):
        self.records = {}

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.perf_counter()
        yield
        # block on any outstanding device work so phases are attributable
        jax.effects_barrier()
        self.records.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self):
        return {
            k: dict(n=len(v), total=sum(v), mean=sum(v) / len(v))
            for k, v in self.records.items()
        }
