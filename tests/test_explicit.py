"""Explicit MPC: golden value, implicit/explicit agreement, batched
evaluation (reference test/runtests.jl:178-197, 300-327, 379-382)."""

import numpy as np
import pytest

import linearmpc_tpu as lmpc
from linearmpc_tpu.explicit import build_explicit, make_singlesided
from linearmpc_tpu.mpc import MPC

GOLDEN_U = 1.7612519326


def test_explicit_invpend_golden():
    mpc, rng = lmpc.mpc_examples("invpend")
    mpc.setup()
    empc = build_explicit(mpc, prange=rng)
    assert empc is not None and len(empc.regions) > 1
    u = empc.compute_control([5.0, 5.0, 0.0, 0.0], uprev=[0.0])
    assert np.linalg.norm(u - GOLDEN_U) < 1e-6


def test_explicit_matches_implicit_sampled():
    mpc, rng_box = lmpc.mpc_examples("invpend")
    mpc.setup()
    empc = build_explicit(mpc, prange=rng_box)
    rng = np.random.default_rng(5)
    n_miss = 0
    for _ in range(100):
        x = rng.uniform(-15, 15, 4)
        r = rng.uniform(-15, 15, 2)
        up = rng.uniform(-2, 2, 1)
        u_imp = mpc.compute_control(x, r=r, uprev=up)
        theta = mpc.form_parameter(x, r=r, uprev=up)
        u_exp = empc.evaluate(theta)
        if u_exp is None:
            n_miss += 1
            continue
        assert np.max(np.abs(u_imp - u_exp)) < 1e-6
    assert n_miss <= 5  # enumeration must cover nearly all of the box


def test_explicit_batched_evaluation():
    mpc, rng_box = lmpc.mpc_examples("invpend")
    mpc.setup()
    empc = build_explicit(mpc, prange=rng_box)
    rng = np.random.default_rng(6)
    B = 64
    thetas = np.hstack([
        rng.uniform(-15, 15, (B, 4)),
        rng.uniform(-15, 15, (B, 2)),
        rng.uniform(-2, 2, (B, 1)),
    ])
    us, viol = empc.evaluate_batch(thetas)
    us = np.asarray(us)
    for i in range(B):
        u_imp = mpc.compute_control(thetas[i, :4], r=thetas[i, 4:6], uprev=thetas[i, 6:])
        if float(viol[i]) < 1e-8:
            assert np.max(np.abs(us[i] - u_imp)) < 1e-6


def test_explicit_simulation_matches_implicit():
    """(reference test/runtests.jl:300-319)"""
    A = np.array([[1.0, 1], [0, 1]])
    B = np.array([[0.0], [1]])
    mpc = MPC.from_discrete(A, B, C=np.eye(2), Np=5, Nc=3)
    mpc.set_bounds(umin=[-2.0], umax=[2.0], ymin=[-1.0, -0.5], ymax=[1.0, 0.5])
    mpc.set_objective(Q=[1.0, 1.0], R=[0.1])
    mpc.setup()
    empc = build_explicit(mpc, prange=mpc.parameter_range())

    N = 20
    r_traj = np.zeros((2, N))
    r_traj[0, 10:] = 1.0
    sim_imp = lmpc.simulate_kw(mpc, x0=[1.0, 0.0], N=N, r=r_traj)
    sim_exp = lmpc.simulate_kw(empc, x0=[1.0, 0.0], N=N, r=r_traj)
    assert np.linalg.norm(sim_imp.ys - sim_exp.ys) < 1e-6


def test_explicit_prestab_consistency():
    mpc, rng_box = lmpc.mpc_examples("invpend")
    mpc.set_prestabilizing_feedback()
    mpc.setup()
    empc = build_explicit(mpc, prange=rng_box)
    u_imp = mpc.compute_control([5.0, 5.0, 0.0, 0.0], uprev=[0.0])
    u_exp = empc.compute_control([5.0, 5.0, 0.0, 0.0], uprev=[0.0])
    # NOTE: with Nc < Np the held decision variable is v = u + Kx, so the
    # prestabilized problem differs from the nominal one by design (the
    # reference's predictor holds v too, src/mpc2mpqp.jl:38-44); only
    # implicit/explicit consistency is asserted here.
    assert np.max(np.abs(u_imp - u_exp)) < 1e-6


def test_make_singlesided_shapes():
    """(reference test/runtests.jl:1548-1570)"""
    mpc, _ = lmpc.mpc_examples("dcmotor")
    qp = lmpc.mpc2mpqp(mpc)
    ss = make_singlesided(qp, single_soft=False)
    nsoft = int(np.sum((qp.senses & lmpc.types.SOFT) != 0)) if hasattr(lmpc, "types") else None
    assert ss.H.shape[0] == ss.H.shape[1]
    assert ss.A.shape[1] == ss.H.shape[0]
    assert len(ss.b) == ss.A.shape[0] == ss.W.shape[0]
    ss1 = make_singlesided(qp, single_soft=True)
    assert ss1.H.shape[0] == qp.H.shape[0] + 1  # one shared slack


def test_explicit_bst_evaluation():
    """BST point location agrees with the full scan (reference build_tree!,
    test/runtests.jl:180-183)."""
    mpc, rng_box = lmpc.mpc_examples("invpend")
    mpc.setup()
    empc = build_explicit(mpc, prange=rng_box)
    empc.build_tree()
    rng = np.random.default_rng(9)
    for _ in range(50):
        theta = np.concatenate([
            rng.uniform(-15, 15, 4), rng.uniform(-15, 15, 2), rng.uniform(-2, 2, 1),
        ])
        u_scan = empc.evaluate(theta)
        u_tree = empc.evaluate_tree(theta)
        if u_scan is None:
            continue
        assert np.allclose(u_scan, u_tree, atol=1e-10)


def test_model_from_statespace():
    import scipy.signal as sig

    A = [[0.0, 1], [-2, -0.5]]
    B = [[0.0], [1]]
    C = [[1.0, 0]]
    D = [[0.0]]
    sys = sig.StateSpace(A, B, C, D)
    model = lmpc.model_from_statespace(sys, Ts=0.1)
    assert model.nx == 2 and model.nu == 1 and model.ny == 1
    sysd = sig.StateSpace([[0.9]], [[1.0]], [[1.0]], [[0.0]], dt=0.2)
    md = lmpc.model_from_statespace(sysd)
    assert md.Ts == 0.2 and md.F[0, 0] == 0.9
    # disturbance-channel split
    m2 = lmpc.model_from_statespace((np.eye(2), np.ones((2, 3)), np.eye(2), np.zeros((2, 3))), Ts=0.1, nd=1)
    assert m2.nu == 2 and m2.nd == 1


def test_explicit_game_theoretic():
    """Game-theoretic (non-symmetric H, AVI) explicit MPC matches the
    implicit controller in closed loop (reference test/runtests.jl:1337-1358)."""
    from linearmpc_tpu.mpc import MPC as _MPC

    def build():
        F = np.array([[1.0, 0.1], [0, 1]])
        G = np.array([[0.0, 0], [1, 1]])
        mpc = _MPC.from_discrete(F, G, C=np.eye(2), Np=10)
        mpc.set_objective(uids=[0], Q=[1, 0], Rr=1e3 * np.eye(1))
        mpc.set_objective(uids=[1], Q=[0, 1], Rr=1e3 * np.eye(1))
        mpc.set_bounds(umin=-np.ones(2), umax=np.ones(2))
        mpc.move_block([1, 1, 8])
        return mpc

    mpc = build()
    mpc.setup()
    assert not np.allclose(mpc.mpQP.H, mpc.mpQP.H.T)
    empc = build_explicit(mpc, prange=mpc.parameter_range())
    assert empc is not None and len(empc.regions) >= 1

    sim_imp = lmpc.simulate_kw(build(), x0=10 * np.ones(2), r=[10, 0], N=500)
    sim_exp = lmpc.simulate_kw(empc, x0=10 * np.ones(2), r=[10, 0], N=500)
    assert np.max(np.abs(sim_imp.us - sim_exp.us)) < 1e-4
    assert abs(sim_exp.ys[0, -1] - 10.0) < 1e-4
    assert abs(sim_exp.ys[1, -1]) < 1e-4


def test_bst_exact_descent():
    """Exact LP-classified splits: for every sampled theta, the BST leaf's
    candidate list contains the region holding theta (no full-scan
    fallback needed), and the leaf evaluation matches the linear scan."""
    mpc, rng_box = lmpc.mpc_examples("invpend")
    mpc.setup()
    empc = build_explicit(mpc, prange=rng_box)
    empc.build_tree(leaf_size=3)
    A, b, kids, leaf_off, leaf_reg, depth, _root = empc.bst_arrays()
    assert depth <= 32 and len(leaf_off) >= 2
    rng = np.random.default_rng(11)
    n_checked = 0
    for _ in range(200):
        theta = np.concatenate([
            rng.uniform(-15, 15, 4), rng.uniform(-15, 15, 2), rng.uniform(-2, 2, 1),
        ])
        u_scan = empc.evaluate(theta)
        if u_scan is None:
            continue
        # descend
        node = 0
        for _d in range(depth + 1):
            node = kids[node, 1] if A[node] @ theta - b[node] > 0 else kids[node, 0]
            if node < 0:
                break
        assert node < 0, "descent must end in a leaf"
        leaf = -node - 1
        cands = leaf_reg[leaf_off[leaf]:leaf_off[leaf + 1]]
        hit = [r for r in cands
               if np.max(empc.regions[r].Ath @ theta - empc.regions[r].bth,
                         initial=-np.inf) <= 1e-8]
        assert hit, "leaf must contain the region holding theta"
        cr = empc.regions[hit[0]]
        u_leaf = cr.F[:empc.nu] @ theta + cr.g[:empc.nu]
        assert np.allclose(u_leaf, u_scan, atol=1e-9)
        n_checked += 1
    assert n_checked > 120
