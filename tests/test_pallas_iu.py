"""Differential tests for the large-m Pallas GI inverse-update bulk phase
(ops/pallas_iu.py) against the NumPy f64 oracle and the XLA IU path, run
through the Mosaic interpreter on CPU (LINEARMPC_TPU_IUPALLAS=interpret)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import linearmpc_tpu as lmpc
from linearmpc_tpu.ops.reference_solver import solve_ldp_numpy


def _largem_mpc():
    mpc, _ = lmpc.mpc_examples("invpend", 30, 8)
    mpc.add_constraint(Ax=np.eye(4), lb=-18 * np.ones(4), ub=18 * np.ones(4),
                       ks=range(2, 12))
    return mpc


def _thetas(B, lo=8.0, seed=0):
    rng = np.random.default_rng(seed)
    return np.hstack([
        rng.uniform(-lo, lo, (B, 4)), rng.uniform(-lo, lo, (B, 2)),
        rng.uniform(-2, 2, (B, 1)),
    ])


@pytest.fixture()
def iu_pallas_env(monkeypatch):
    monkeypatch.setenv("LINEARMPC_TPU_IUPALLAS", "interpret")


def test_iu_pallas_matches_oracle(iu_pallas_env):
    mpc = _largem_mpc()
    mpc.setup(dtype=jnp.float32)
    e = mpc.engine
    assert e.use_iu_batch and e.use_iu_pallas and e.ldp.m == 48

    thetas = _thetas(128)
    sol = e.solve_batch(thetas)
    status = np.asarray(sol.status)
    U = np.asarray(sol.U, np.float64)

    n_ok = n_infeas = 0
    for i in range(thetas.shape[0]):
        U_ref, *_r, s_ref = solve_ldp_numpy(e.ldp, thetas[i])
        if s_ref == 1:
            n_ok += 1
            assert status[i] == 1, f"lane {i}: engine {status[i]} vs oracle feasible"
            assert np.max(np.abs(U[i] - U_ref)) < 1e-8
        elif s_ref == -3:
            n_infeas += 1
            assert status[i] == -3
    assert n_ok >= 100  # the sampling box is mostly feasible


def test_iu_pallas_infeasible_detection(iu_pallas_env):
    """Far-out states make the state-constrained problem primal infeasible;
    the kernel's dual-unbounded-ray exit must flag them."""
    mpc = _largem_mpc()
    mpc.setup(dtype=jnp.float32)
    e = mpc.engine
    thetas = _thetas(128, lo=40.0, seed=3)
    sol = e.solve_batch(thetas)
    status = np.asarray(sol.status)
    for i in range(0, 128, 4):
        _U, *_r, s_ref = solve_ldp_numpy(e.ldp, thetas[i])
        if s_ref == -3:
            assert status[i] == -3
        elif s_ref == 1:
            assert status[i] == 1


def test_iu_pallas_warm_start(iu_pallas_env):
    """Warm starts (non-trivial R0 init) run the same kernel and land on
    the same solutions."""
    mpc = _largem_mpc()
    mpc.setup(dtype=jnp.float32)
    e = mpc.engine
    thetas = _thetas(128, seed=7)
    cold = e.solve_batch(thetas)
    warm = e.solve_batch(thetas, warm=(cold.lam, cold.active, cold.side))
    ok = np.asarray(cold.status) == 1
    assert np.max(np.abs(np.asarray(warm.U)[ok] - np.asarray(cold.U)[ok])) < 1e-8
    assert np.mean(np.asarray(warm.iters)[ok] <= np.asarray(cold.iters)[ok]) > 0.9


def test_iu_pallas_agrees_with_xla_iu_path():
    """Same engine, Pallas bulk phase off: solutions agree to f64 polish."""
    thetas = _thetas(128, seed=11)

    os.environ["LINEARMPC_TPU_IUPALLAS"] = "interpret"
    try:
        mpc = _largem_mpc()
        mpc.setup(dtype=jnp.float32)
        sol_p = mpc.engine.solve_batch(thetas)
    finally:
        os.environ["LINEARMPC_TPU_IUPALLAS"] = "0"
    try:
        mpc2 = _largem_mpc()
        mpc2.setup(dtype=jnp.float32)
        assert not mpc2.engine.use_iu_pallas
        sol_x = mpc2.engine.solve_batch(thetas)
    finally:
        del os.environ["LINEARMPC_TPU_IUPALLAS"]

    ok = (np.asarray(sol_p.status) == 1) & (np.asarray(sol_x.status) == 1)
    assert np.mean(ok) > 0.9
    assert np.max(np.abs(np.asarray(sol_p.U)[ok] - np.asarray(sol_x.U)[ok])) < 1e-7


def test_iu_fused_rollout_matches_xla(iu_pallas_env):
    """Large-m fused rollout (warm-started GI kernel, carried R in the scan
    carry) must produce the same closed-loop controls as the XLA
    solve_single rollout path."""
    import jax.numpy as jnp

    from linearmpc_tpu.rollout import build_rollout

    mpc = _largem_mpc()
    mpc.setup(dtype=jnp.float32)
    assert hasattr(mpc.engine, "fused_rollout_solve_iu")
    roll_fused = build_rollout(mpc)

    mpc2 = _largem_mpc()
    os.environ["LINEARMPC_TPU_IUPALLAS"] = "0"
    try:
        mpc2.setup(dtype=jnp.float32)
        assert not getattr(mpc2.engine, "use_iu_pallas", False)
        roll_xla = build_rollout(mpc2)
    finally:
        os.environ["LINEARMPC_TPU_IUPALLAS"] = "interpret"

    rng = np.random.default_rng(5)
    B, N = 128, 6
    x0s = rng.uniform(-3, 3, (B, 4))
    rs = np.zeros((B, 2))
    rf = roll_fused(x0s, rs, None, N=N)
    rx = roll_xla(x0s, rs, None, N=N)
    assert np.mean(np.asarray(rf.status) == 1) > 0.99
    assert np.max(np.abs(np.asarray(rf.us) - np.asarray(rx.us))) < 1e-5
    assert np.max(np.abs(np.asarray(rf.xs) - np.asarray(rx.xs))) < 1e-4
