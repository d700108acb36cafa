"""Native (C++) serial runtime: Lie core + SE(3) MS-iLQR executor.

The reference leans on the manif C++ library for its Lie math
(`traoptlibrary/traopt_dynamics.py:11`) and runs its solvers as Python loops
over those bindings; this package provides the equivalent native layer
first-party: `src/lie.hpp` (closed-form SO(3)/SE(3) ops) and `src/ilqr.cpp`
(the whole MS-iLQR hot loop in C++), exposed through ctypes (no pybind11
dependency).

Uses: (a) implementation-independent cross-check of the JAX/Pallas engines
(tests/test_native.py), (b) deployable host/embedded MPC runtime where no
TPU is attached, (c) a fast CPU reference point for the bench.

The shared library is compiled on demand with g++ -O3 and cached next to the
sources; import fails softly (``LIB = None``) when no toolchain is present.
"""

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "ilqr.cpp")
_HDR = os.path.join(_DIR, "src", "lie.hpp")
_LIB_PATH = os.path.join(_DIR, "_traopt_native.so")


def _build():
    """(Re)compile the shared library if missing or older than the sources."""
    if os.path.exists(_LIB_PATH):
        t_lib = os.path.getmtime(_LIB_PATH)
        if t_lib >= max(os.path.getmtime(_SRC), os.path.getmtime(_HDR)):
            return _LIB_PATH
    with tempfile.TemporaryDirectory() as td:
        tmp = os.path.join(td, "_traopt_native.so")
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
             _SRC, "-o", tmp],
            check=True, capture_output=True)
        os.replace(tmp, _LIB_PATH)
    return _LIB_PATH


def _load():
    lib = ctypes.CDLL(_build())
    dp = ctypes.POINTER(ctypes.c_double)
    lib.traopt_se3_ms_ilqr_solve.restype = ctypes.c_int
    lib.traopt_se3_ms_ilqr_solve.argtypes = [
        dp, ctypes.c_double, dp, dp, dp, dp, dp, ctypes.c_int, ctypes.c_int,
        dp, dp, dp, dp, dp]
    lib.traopt_se3_ms_ilqr_solve_batch.restype = ctypes.c_int
    lib.traopt_se3_ms_ilqr_solve_batch.argtypes = [
        dp, ctypes.c_double, dp, dp, dp, dp, dp, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, dp, dp, dp, dp, dp]
    lib.traopt_rb_ms_ilqr_solve.restype = ctypes.c_int
    lib.traopt_rb_ms_ilqr_solve.argtypes = [
        dp, ctypes.c_double, ctypes.c_double, dp, ctypes.c_int, dp, dp, dp,
        dp, dp, ctypes.c_int, ctypes.c_int, dp, dp, dp, dp, dp]
    lib.traopt_rb_ms_ilqr_solve_batch.restype = ctypes.c_int
    lib.traopt_rb_ms_ilqr_solve_batch.argtypes = [
        dp, ctypes.c_double, ctypes.c_double, dp, ctypes.c_int, dp, dp, dp,
        dp, dp, ctypes.c_int, ctypes.c_int, ctypes.c_int, dp, dp, dp, dp, dp]
    return lib


try:
    LIB = _load()
except Exception:  # toolchain or build failure -> soft-disable
    LIB = None


def _c(a):
    return np.ascontiguousarray(a, dtype=np.float64)


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class NativeSE3Solver:
    """Serial C++ MS-iLQR (fixed budget, mu = 0) on the SE(3) tracking
    families: free body (default), rigid body under gravity (``g > 0``),
    and the drone (``Pu`` 6x4 projection, nu = 4).

    Same iterate sequence as `solvers.batched.FastBatchSolver` at f64; see
    native/src/ilqr.cpp for the solver layout.
    """

    def __init__(self, J, dt, Q, R, P, q_ref, xi_ref, iterations: int,
                 g: float = 0.0, Pu=None):
        if LIB is None:
            raise RuntimeError("native library unavailable (no g++?)")
        self.J = _c(J)
        self.dt = float(dt)
        self.Q = _c(Q)
        self.R = _c(R)
        self.P = _c(P)
        self.q_ref = _c(q_ref)
        self.xi_ref = _c(xi_ref).reshape(-1, 6)
        self.N = self.q_ref.shape[0] - 1
        self.iterations = iterations
        self.g = float(g)
        self.Pu = None if Pu is None else _c(Pu)
        self.nu = 6 if self.Pu is None else int(self.Pu.shape[1])
        if self.R.shape != (self.nu, self.nu):
            raise ValueError(f"R must be ({self.nu},{self.nu})")

    def _pu_ptr(self):
        return None if self.Pu is None else _ptr(self.Pu)

    def solve(self, q0, xi0, us0=None):
        """One problem: returns (us, J, grad_norm)."""
        us = (_c(us0).copy() if us0 is not None
              else np.zeros((self.N, self.nu)))
        J_out = np.zeros(1)
        g_out = np.zeros(1)
        rc = LIB.traopt_rb_ms_ilqr_solve(
            _ptr(self.J), self.dt, self.g, self._pu_ptr(), self.nu,
            _ptr(self.Q), _ptr(self.R), _ptr(self.P),
            _ptr(self.q_ref), _ptr(self.xi_ref), self.N, self.iterations,
            _ptr(_c(q0)), _ptr(_c(xi0)), _ptr(us), _ptr(J_out), _ptr(g_out))
        if rc:
            raise RuntimeError(f"native solve failed (rc={rc})")
        return us, float(J_out[0]), float(g_out[0])

    def solve_batch(self, q0s, xi0s, us0=None):
        """B independent problems: returns (us (B,N,nu), J (B,), grad (B,))."""
        q0s = _c(q0s)
        B = q0s.shape[0]
        us = (_c(us0).copy() if us0 is not None
              else np.zeros((B, self.N, self.nu)))
        J_out = np.zeros(B)
        g_out = np.zeros(B)
        rc = LIB.traopt_rb_ms_ilqr_solve_batch(
            _ptr(self.J), self.dt, self.g, self._pu_ptr(), self.nu,
            _ptr(self.Q), _ptr(self.R), _ptr(self.P),
            _ptr(self.q_ref), _ptr(self.xi_ref), self.N, self.iterations, B,
            _ptr(q0s), _ptr(_c(xi0s)), _ptr(us), _ptr(J_out), _ptr(g_out))
        if rc:
            raise RuntimeError(f"native batch solve failed (rc={rc})")
        return us, J_out, g_out
