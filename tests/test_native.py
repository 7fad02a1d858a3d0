"""Native C++ batched runtime: differential tests vs the device engine and
throughput sanity (skipped when no C++ compiler is available)."""

import shutil
import time

import numpy as np
import pytest

import linearmpc_tpu as lmpc
from linearmpc_tpu.mpc import MPC

needs_cxx = pytest.mark.skipif(
    shutil.which("g++") is None and shutil.which("clang++") is None,
    reason="no C++ compiler",
)


@needs_cxx
def test_native_matches_engine():
    from linearmpc_tpu.native_runtime import NativeBatchSolver

    mpc, _ = lmpc.mpc_examples("invpend")
    mpc.setup()
    solver = NativeBatchSolver(mpc.engine.ldp, nu=mpc.model.nu)
    rng = np.random.default_rng(0)
    B = 512
    thetas = np.hstack([
        rng.uniform(-20, 20, (B, 4)), rng.uniform(-20, 20, (B, 2)),
        rng.uniform(-2, 2, (B, 1)),
    ])
    U, iters, status = solver.solve_batch(thetas)
    assert np.all(status == 1)
    sol = mpc.engine.solve_batch(thetas)
    assert np.max(np.abs(U - np.asarray(sol.U))) < 1e-9


@needs_cxx
def test_native_golden():
    from linearmpc_tpu.native_runtime import NativeBatchSolver

    mpc, _ = lmpc.mpc_examples("invpend")
    mpc.setup()
    solver = NativeBatchSolver(mpc.engine.ldp)
    theta = mpc.form_parameter([5.0, 5.0, 0.0, 0.0], uprev=[0.0])
    U, iters, status = solver.solve_batch(theta[None, :])
    assert status[0] == 1
    assert abs(U[0, 0] - 1.7612519326) < 1e-6


@needs_cxx
def test_native_soft_and_priority():
    from linearmpc_tpu.native_runtime import NativeBatchSolver

    mpc, _ = lmpc.mpc_examples("dcmotor")
    mpc.setup()
    solver = NativeBatchSolver(mpc.engine.ldp)
    rng = np.random.default_rng(3)
    B = 64
    nth = mpc.engine.ldp.n_theta
    thetas = rng.uniform(-1, 1, (B, nth))
    U, iters, status = solver.solve_batch(thetas)
    assert np.all(status == 1)
    sol = mpc.engine.solve_batch(thetas)
    assert np.max(np.abs(U - np.asarray(sol.U))) < 1e-8


@needs_cxx
def test_native_throughput_sanity():
    """The native runtime should clear thousands of solves/s on host CPU."""
    from linearmpc_tpu.native_runtime import NativeBatchSolver

    mpc, _ = lmpc.mpc_examples("invpend")
    mpc.setup()
    solver = NativeBatchSolver(mpc.engine.ldp)
    rng = np.random.default_rng(1)
    B = 4096
    thetas = np.hstack([
        rng.uniform(-20, 20, (B, 4)), rng.uniform(-20, 20, (B, 2)),
        rng.uniform(-2, 2, (B, 1)),
    ])
    solver.solve_batch(thetas)  # warm
    t0 = time.perf_counter()
    U, iters, status = solver.solve_batch(thetas)
    dt = time.perf_counter() - t0
    assert np.all(status == 1)
    assert B / dt > 10000  # conservative floor
