"""Differential tests for the compact working-set Pallas bulk phase
(ops/pallas_ciu.py) against the NumPy f64 oracle and the XLA compact loop,
run through the Mosaic interpreter on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

import linearmpc_tpu as lmpc
from linearmpc_tpu.ops.pallas_ciu import (
    init_compact_batch, phase1_ciu_pallas_while)
from linearmpc_tpu.ops.reference_solver import solve_ldp_numpy


def _mpc_m48():
    mpc, _ = lmpc.mpc_examples("invpend", 30, 8)
    mpc.add_constraint(Ax=np.eye(4), lb=-18 * np.ones(4), ub=18 * np.ones(4),
                       ks=range(2, 12))
    mpc.setup(dtype=jnp.float32)
    return mpc


def _thetas(B, lo=8.0, seed=0):
    rng = np.random.default_rng(seed)
    return np.hstack([
        rng.uniform(-lo, lo, (B, 4)), rng.uniform(-lo, lo, (B, 2)),
        rng.uniform(-2, 2, (B, 1)),
    ])


def _run_kernel(e, thetas, s, max_iter=120):
    arr = e.arrays
    m = arr.G.shape[0]
    B = thetas.shape[0]
    P = jax.lax.Precision.HIGHEST
    th32 = jnp.asarray(thetas, jnp.float32)
    du_t = arr.du + jnp.dot(th32, arr.Dth.T, precision=P)
    dl_t = arr.dl + jnp.dot(th32, arr.Dth.T, precision=P)
    eps32 = float(np.finfo(np.float32).eps)
    softd = jnp.asarray(np.asarray(e.ldp.rho_soft, np.float64) + 4 * eps32,
                        jnp.float32)
    act0 = jnp.broadcast_to(arr.is_eq, (B, m))
    Rw0, SEL0, _ovf0 = init_compact_batch(arr.G_solve, act0, s)
    return phase1_ciu_pallas_while(
        arr.G, softd, du_t, dl_t, arr.is_eq.astype(jnp.float32),
        arr.is_immutable.astype(jnp.float32),
        jnp.zeros((B, m), jnp.float32), act0.astype(jnp.float32),
        jnp.ones((B, m), jnp.float32), SEL0, Rw0,
        m=m, s=s, max_iter=max_iter,
        primal_tol=e.primal_tol, sign_tol=e.sign_tol,
        interpret=True, retry_infeas=False,
    ), (du_t, dl_t)


def test_ciu_pallas_matches_oracle():
    mpc = _mpc_m48()
    e = mpc.engine
    thetas = _thetas(128)
    (lam, act, side, iters, done, infeas, ovf, SEL, Rw), _ = _run_kernel(
        e, thetas, s=24)
    from linearmpc_tpu.ops.dual_active_set import polish_solution

    hi = e.arrays_hi
    sol = jax.vmap(lambda t, a, sd: polish_solution(hi, t, a, sd))(
        jnp.asarray(thetas), act, side)
    U = np.asarray(sol.U, np.float64)
    done_n = np.asarray(done)
    inf_n = np.asarray(infeas)
    ovf_n = np.asarray(ovf)
    n_ok = n_tight = 0
    for i in range(thetas.shape[0]):
        U_ref, *_r, s_ref = solve_ldp_numpy(e.ldp, thetas[i])
        if s_ref == 1 and done_n[i] and not inf_n[i] and not ovf_n[i]:
            n_ok += 1
            err = np.max(np.abs(U[i] - U_ref))
            # f32 near-ties can converge onto an adjacent active set (the
            # production engine routes such lanes through the f64
            # straggler tier by their KKT residual); the bulk answer must
            # still be f32-close, and most lanes land on the exact set
            assert err < 5e-3, i
            n_tight += err < 1e-5
        if s_ref == 1:
            assert not inf_n[i], f"lane {i}: false infeasibility flag"
    assert n_ok >= 100
    assert n_tight >= 0.9 * n_ok


def test_ciu_pallas_matches_xla_compact_loop():
    """Lane-for-lane agreement with ops/compact_iu (same GI scheme)."""
    from linearmpc_tpu.ops.compact_iu import _active_set_loop_ciu

    mpc = _mpc_m48()
    e = mpc.engine
    arr = e.arrays
    m = arr.G.shape[0]
    thetas = _thetas(128, seed=5)
    s = 24
    (lam, act, side, iters, done, infeas, ovf, _S, _R), (du_t, dl_t) = (
        _run_kernel(e, thetas, s=s))
    st, ovf_x = jax.vmap(
        lambda dut, dlt: _active_set_loop_ciu(
            arr, dut, dlt, arr.is_eq, arr.is_immutable,
            jnp.zeros(m, jnp.float32), arr.is_eq, jnp.ones(m, bool),
            s_max=s, max_iter=120,
            primal_tol=e.primal_tol, sign_tol=e.sign_tol)
    )(du_t, dl_t)
    both = np.asarray(done) & ~np.asarray(infeas) & ~np.asarray(ovf) \
        & np.asarray(st.done) & ~np.asarray(st.infeas) & ~np.asarray(ovf_x)
    assert both.mean() > 0.9
    assert np.array_equal(np.asarray(act)[both], np.asarray(st.active)[both])
    # raw f32 multipliers differ by Woodbury accumulation order; what
    # feeds downstream is the active set (f64 polish re-solves it) --
    # polished controls must agree exactly
    from linearmpc_tpu.ops.dual_active_set import polish_solution

    hi = e.arrays_hi
    th = jnp.asarray(thetas)
    U_p = jax.vmap(lambda t, a, sd: polish_solution(hi, t, a, sd))(
        th, act, side).U
    U_x = jax.vmap(lambda t, a, sd: polish_solution(hi, t, a, sd))(
        th, st.active, st.side).U
    assert np.max(np.abs(np.asarray(U_p)[both] - np.asarray(U_x)[both])) < 1e-9


def test_ciu_pallas_overflow_flag():
    """A capacity too small for the working set must raise ovf, not return
    a wrong 'optimal'."""
    mpc = _mpc_m48()
    e = mpc.engine
    thetas = _thetas(128, lo=14.0, seed=9)
    (lam, act, side, iters, done, infeas, ovf, _S, _R), _ = _run_kernel(
        e, thetas, s=8)
    from linearmpc_tpu.ops.dual_active_set import polish_solution

    hi = e.arrays_hi
    sol = jax.vmap(lambda t, a, sd: polish_solution(hi, t, a, sd))(
        jnp.asarray(thetas), act, side)
    U = np.asarray(sol.U, np.float64)
    ok = np.asarray(done) & ~np.asarray(infeas) & ~np.asarray(ovf)
    n_chk = 0
    for i in range(0, 128, 2):
        U_ref, *_r, s_ref = solve_ldp_numpy(e.ldp, thetas[i])
        if s_ref == 1 and ok[i]:
            n_chk += 1
            assert np.max(np.abs(U[i] - U_ref)) < 1e-5, i
    assert n_chk > 10


def test_ciu_pallas_engine_path(monkeypatch):
    """Engine-level routing: cold batched solves go through the Pallas
    compact bulk (interpret mode on CPU) and still match the oracle after
    the production finishing tiers."""
    monkeypatch.setenv("LINEARMPC_TPU_CIUPALLAS", "interpret")
    mpc = _mpc_m48()
    e = mpc.engine
    assert e.use_ciu_batch and e.use_ciu_pallas
    thetas = _thetas(128, seed=13)
    sol = e.solve_batch(thetas)
    st = np.asarray(sol.status)
    U = np.asarray(sol.U, np.float64)
    n_ok = 0
    for i in range(thetas.shape[0]):
        U_ref, *_r, s_ref = solve_ldp_numpy(e.ldp, thetas[i])
        if s_ref == 1:
            n_ok += 1
            assert st[i] == 1, i
            assert np.max(np.abs(U[i] - U_ref)) < 1e-8, i
    assert n_ok >= 100


def test_ciu_second_chance_absorbs_iteration_tail(monkeypatch):
    """VERDICT r3 #1: with the cold bulk capped absurdly low, nearly every
    lane is a straggler; the second-chance Pallas pass (warm resume at
    slot capacity s2 with the full budget) must still resolve the batch
    to oracle accuracy -- the f64 guard tier only holds 64+32 lanes, so
    a broken second chance cannot hide behind it."""
    monkeypatch.setenv("LINEARMPC_TPU_CIUPALLAS", "interpret")
    monkeypatch.setenv("LINEARMPC_TPU_CIU_CAP", "4")
    mpc = _mpc_m48()
    e = mpc.engine
    assert e.use_ciu_pallas and e._ciu_s2 is not None
    thetas = _thetas(128, seed=21)
    sol = e.solve_batch(thetas)
    st = np.asarray(sol.status)
    U = np.asarray(sol.U, np.float64)
    n_ok = 0
    for i in range(thetas.shape[0]):
        U_ref, *_r, s_ref = solve_ldp_numpy(e.ldp, thetas[i])
        if s_ref == 1:
            n_ok += 1
            assert st[i] == 1, i
            assert np.max(np.abs(U[i] - U_ref)) < 1e-8, i
    assert n_ok >= 100


def test_ciu_second_chance_resolves_overflow(monkeypatch):
    """Lanes that overflow the first pass's slot capacity must be
    re-solved by the second-chance pass at doubled capacity, not dumped
    wholesale on the f64 guard tier."""
    monkeypatch.setenv("LINEARMPC_TPU_CIUPALLAS", "interpret")
    monkeypatch.setenv("LINEARMPC_TPU_CIU_SMAX", "8")
    mpc = _mpc_m48()
    e = mpc.engine
    assert e.ciu_s_max == 8 and e._ciu_s2 == 16
    thetas = _thetas(128, lo=14.0, seed=9)  # wide box: larger active sets
    sol = e.solve_batch(thetas)
    st = np.asarray(sol.status)
    U = np.asarray(sol.U, np.float64)
    n_ok = 0
    for i in range(thetas.shape[0]):
        U_ref, *_r, s_ref = solve_ldp_numpy(e.ldp, thetas[i])
        if s_ref == 1:
            n_ok += 1
            assert st[i] == 1, i
            assert np.max(np.abs(U[i] - U_ref)) < 1e-8, i
    assert n_ok >= 60


def test_ciu_second_chance_off_matches(monkeypatch):
    """LINEARMPC_TPU_CIU_SECOND=0 restores the round-3 tiering (wide f64
    pools); both configurations must produce the same controls."""
    thetas = _thetas(128, seed=33)
    monkeypatch.setenv("LINEARMPC_TPU_CIUPALLAS", "interpret")
    mpc_a = _mpc_m48()
    sol_a = mpc_a.engine.solve_batch(thetas)
    monkeypatch.setenv("LINEARMPC_TPU_CIU_SECOND", "0")
    mpc_b = _mpc_m48()
    assert mpc_b.engine._ciu_s2 is None
    sol_b = mpc_b.engine.solve_batch(thetas)
    ok = (np.asarray(sol_a.status) == 1) & (np.asarray(sol_b.status) == 1)
    assert ok.mean() > 0.9
    assert np.max(np.abs(np.asarray(sol_a.U)[ok] - np.asarray(sol_b.U)[ok])) < 1e-8


def test_ciu_engine_infeasibility_verdicts(monkeypatch):
    """Wide-box batch with a real mix of feasible and infeasible lanes:
    every oracle-feasible lane must come back optimal (never a false -3
    -- the round-4 probe caught the second-chance pass fabricating ~46
    of them per 8192 before the improvement-gated merge), and every
    oracle-certified-infeasible lane must come back -3 (a lane passing
    the f64 KKT residual has an exhibited feasible point, so a false 1
    is impossible by construction -- pin it anyway)."""
    from scipy.optimize import linprog

    monkeypatch.setenv("LINEARMPC_TPU_CIUPALLAS", "interpret")
    mpc = _mpc_m48()
    e = mpc.engine
    ldp = e.ldp
    thetas = _thetas(128, lo=16.0, seed=77)
    sol = e.solve_batch(thetas)
    st = np.asarray(sol.status)
    # exact primal feasibility oracle (HiGHS): the normalized constraint
    # rows in U-space are E_n = HinvET' H (hard rows only)
    E_n = ldp.HinvET.T @ ldp.H
    hard = ~ldp.is_immutable & ~ldp.is_soft

    def feasible(theta):
        du_t = ldp.du + ldp.Dth @ theta
        dl_t = ldp.dl + ldp.Dth @ theta
        A = np.vstack([E_n[hard], -E_n[hard]])
        b = np.concatenate([du_t[hard], -dl_t[hard]])
        keep = b < 1e19
        res = linprog(np.zeros(E_n.shape[1]), A_ub=A[keep], b_ub=b[keep],
                      bounds=[(None, None)] * E_n.shape[1], method="highs")
        return res.status == 0
    n_feas = n_inf = 0
    for i in range(128):
        _U, *_r, s_ref = solve_ldp_numpy(ldp, thetas[i])
        if s_ref == 1:
            n_feas += 1
            assert st[i] == 1, (i, st[i])
        elif st[i] == -3:
            # every engine infeasibility verdict must be HiGHS-certified
            n_inf += 1
            assert not feasible(thetas[i]), i
    assert n_feas >= 30 and n_inf >= 10  # the box really is mixed


def test_ciu_fused_rollout_matches_xla(monkeypatch):
    """Fused compact rollout (warm SEL/Rw slot carry in the scan) must
    produce the same closed-loop controls as the solve_single path."""
    from linearmpc_tpu.rollout import build_rollout

    monkeypatch.setenv("LINEARMPC_TPU_CIUPALLAS", "interpret")
    mpc = _mpc_m48()
    e = mpc.engine
    assert hasattr(e, "fused_rollout_solve_ciu")
    roll_fused = build_rollout(mpc)

    monkeypatch.setenv("LINEARMPC_TPU_CIUPALLAS", "0")
    mpc2 = _mpc_m48()
    assert not getattr(mpc2.engine, "use_ciu_pallas", False)
    assert not hasattr(mpc2.engine, "fused_rollout_solve_ciu")
    roll_xla = build_rollout(mpc2)

    rng = np.random.default_rng(5)
    B, N = 128, 6
    x0s = rng.uniform(-3, 3, (B, 4))
    rs = np.zeros((B, 2))
    rf = roll_fused(x0s, rs, None, N=N)
    rx = roll_xla(x0s, rs, None, N=N)
    assert np.mean(np.asarray(rf.status) == 1) > 0.99
    assert np.max(np.abs(np.asarray(rf.us) - np.asarray(rx.us))) < 1e-5
    assert np.max(np.abs(np.asarray(rf.xs) - np.asarray(rx.xs))) < 1e-4
