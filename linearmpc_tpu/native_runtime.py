"""ctypes bridge to the native C++ batched solver (native/batch_solver.cpp).

The CPU-serving runtime: compiles the OpenMP batched dual active-set
library on demand (cached under ``native/build``) and exposes a
``NativeBatchSolver`` with the same problem arrays as the device engine,
for deployments without a JAX runtime. Differential-tested against the
device engine and the NumPy reference.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess

import numpy as np

from .ops.ldp import LDPData

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "batch_solver.cpp")


class _Problem(ctypes.Structure):
    _fields_ = [
        ("m", ctypes.c_int), ("n", ctypes.c_int), ("nth", ctypes.c_int), ("nu", ctypes.c_int),
        ("G", ctypes.POINTER(ctypes.c_double)),
        ("Dth", ctypes.POINTER(ctypes.c_double)),
        ("du", ctypes.POINTER(ctypes.c_double)),
        ("dl", ctypes.POINTER(ctypes.c_double)),
        ("HinvET", ctypes.POINTER(ctypes.c_double)),
        ("Uth_off", ctypes.POINTER(ctypes.c_double)),
        ("u_off", ctypes.POINTER(ctypes.c_double)),
        ("is_eq", ctypes.POINTER(ctypes.c_int)),
        ("is_immutable", ctypes.POINTER(ctypes.c_int)),
        ("rho", ctypes.POINTER(ctypes.c_double)),
        ("iter_limit", ctypes.c_int),
        ("primal_tol", ctypes.c_double),
        ("sign_tol", ctypes.c_double),
    ]


def build_native_library(force: bool = False) -> str | None:
    """Compile the shared library (g++, OpenMP if available); returns its
    path, or None when no compiler is present."""
    cxx = shutil.which("g++") or shutil.which("clang++")
    if cxx is None:
        return None
    build_dir = os.path.join(os.path.dirname(_SRC), "build")
    os.makedirs(build_dir, exist_ok=True)
    lib = os.path.join(build_dir, "libbatchsolver.so")
    src = os.path.abspath(_SRC)
    if not force and os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    cmd = [cxx, "-O3", "-std=c++17", "-shared", "-fPIC", "-o", lib, src]
    try:
        subprocess.run(cmd + ["-fopenmp"], check=True, capture_output=True)
    except subprocess.CalledProcessError:
        subprocess.run(cmd, check=True, capture_output=True)
    return lib


class NativeBatchSolver:
    def __init__(self, ldp: LDPData, *, nu: int | None = None,
                 iter_limit: int = 1000, primal_tol: float = 1e-6,
                 sign_tol: float = 1e-12):
        lib_path = build_native_library()
        if lib_path is None:
            raise RuntimeError("no C++ compiler available for the native runtime")
        self._lib = ctypes.CDLL(lib_path)
        self._lib.lmpc_solve_batch.restype = ctypes.c_int

        as_c = lambda a: np.ascontiguousarray(np.asarray(a, dtype=np.float64))
        as_i = lambda a: np.ascontiguousarray(np.asarray(a, dtype=np.int32))
        # keep referenced arrays alive
        self._hold = [
            as_c(ldp.G), as_c(ldp.Dth), as_c(np.clip(ldp.du, -1e30, 1e30)),
            as_c(np.clip(ldp.dl, -1e30, 1e30)), as_c(ldp.HinvET), as_c(ldp.Uth_off),
            as_c(ldp.u_off), as_i(ldp.is_eq), as_i(ldp.is_immutable), as_c(ldp.rho_soft),
        ]
        dptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        iptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
        self.ldp = ldp
        self._p = _Problem(
            m=ldp.m, n=ldp.n, nth=ldp.n_theta, nu=ldp.n if nu is None else nu,
            G=dptr(self._hold[0]), Dth=dptr(self._hold[1]), du=dptr(self._hold[2]),
            dl=dptr(self._hold[3]), HinvET=dptr(self._hold[4]), Uth_off=dptr(self._hold[5]),
            u_off=dptr(self._hold[6]), is_eq=iptr(self._hold[7]),
            is_immutable=iptr(self._hold[8]), rho=dptr(self._hold[9]),
            iter_limit=iter_limit, primal_tol=primal_tol, sign_tol=sign_tol,
        )

    def solve_batch(self, thetas: np.ndarray):
        """Returns (U (B, n), iters (B,), status (B,))."""
        thetas = np.ascontiguousarray(np.asarray(thetas, dtype=np.float64))
        B = thetas.shape[0]
        U = np.empty((B, self.ldp.n), dtype=np.float64)
        iters = np.empty(B, dtype=np.int32)
        status = np.empty(B, dtype=np.int32)
        self._lib.lmpc_solve_batch(
            ctypes.byref(self._p),
            thetas.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            B,
            U.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            iters.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return U, iters, status
