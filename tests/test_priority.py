"""Prioritized (hierarchical) soft constraints: higher-priority soft rows
must win conflicts (DAQP break_points semantics, reference
src/mpc2mpqp.jl:859-893)."""

import numpy as np

import linearmpc_tpu as lmpc
from linearmpc_tpu.mpc import MPC


def _conflicted_mpc(flip=False):
    mpc = MPC.from_discrete([[1.0]], [[1.0]], C=[[1.0]], Np=3, Nc=3)
    mpc.set_bounds(umin=[-5.0], umax=[5.0])
    mpc.set_objective(Q=[1e-6], R=[1e-6])
    p_hi, p_lo = (1, 0) if flip else (0, 1)
    # conflicting soft state constraints: x >= 1 (priority p_hi) vs
    # x <= -1 (priority p_lo); lower prio value = higher priority
    mpc.add_constraint(Ax=[[1.0]], lb=[1.0], ks=[2, 3], soft=True, prio=p_hi)
    mpc.add_constraint(Ax=[[1.0]], ub=[-1.0], ks=[2, 3], soft=True, prio=p_lo)
    mpc.setup()
    return mpc


def test_priority_levels_resolve_conflict():
    mpc = _conflicted_mpc(flip=False)
    assert len(mpc.mpQP.break_points) > 0
    U, fval, flag, _ = mpc.solve(mpc.form_parameter([0.0], r=[0.0]))
    x1 = 0.0 + U[0]  # state after the first control
    assert x1 > 0.9  # the x >= 1 constraint (higher priority) wins

    mpc2 = _conflicted_mpc(flip=True)
    U2, *_ = mpc2.solve(mpc2.form_parameter([0.0], r=[0.0]))
    x1b = 0.0 + U2[0]
    assert x1b < -0.9  # now the x <= -1 constraint wins


def test_priority_rho_separation():
    mpc = _conflicted_mpc()
    rho = mpc.engine.ldp.rho_soft
    soft = mpc.engine.ldp.is_soft
    vals = np.unique(rho[soft])
    assert len(vals) == 2
    assert vals.max() / vals.min() > 1e3  # geometrically separated levels


def _three_level_conflict(hier):
    """x2 = u1; level 0: x >= 1 AND x <= -1 (symmetric conflict), level 1:
    x >= 0.5. True lexicographic semantics balance level 0 at x = 0 and the
    frozen violations pin x there, so level 1 cannot move it; the proximal
    approximation trades a small level-0 violation for level-1 progress.
    Row scalings differ so preprocessing cannot merge the parallel rows
    (LDP normalization makes their penalties symmetric again)."""
    mpc = MPC.from_discrete([[0.0]], [[1.0]], C=[[1.0]], Np=2, Nc=2)
    mpc.set_bounds(umin=[-5.0], umax=[5.0])
    mpc.set_objective(Q=[1e-6], R=[1e-6])
    mpc.settings.reference_tracking = False
    mpc.add_constraint(Ax=[[1.0]], lb=[1.0], ks=[2], soft=True, prio=0)
    mpc.add_constraint(Ax=[[2.0]], ub=[-2.0], ks=[2], soft=True, prio=0)
    mpc.add_constraint(Ax=[[4.0]], lb=[2.0], ks=[2], soft=True, prio=1)
    mpc.settings.hierarchy = hier
    mpc.setup()
    return mpc


def test_lexicographic_exact_vs_proximal_approximation():
    """settings.hierarchy='lexicographic' reproduces the exact sequential
    semantics (host reference: two solves with manually frozen violations)
    where the proximal mode returns a measurably different answer."""
    mpc_lex = _three_level_conflict("lexicographic")
    mpc_prox = _three_level_conflict("proximal")
    assert mpc_lex.engine.lex is not None
    th = mpc_lex.form_parameter([0.0])
    U_lex, _f, s_lex, _ = mpc_lex.solve(th)
    U_prox, _f2, s_prox, _ = mpc_prox.solve(mpc_prox.form_parameter([0.0]))
    assert s_lex == 1 and s_prox == 1

    # host sequential reference: level 0 alone, then level 1 with level 0
    # hard at the recorded violations
    l0 = MPC.from_discrete([[0.0]], [[1.0]], C=[[1.0]], Np=2, Nc=2)
    l0.set_bounds(umin=[-5.0], umax=[5.0])
    l0.set_objective(Q=[1e-6], R=[1e-6])
    l0.settings.reference_tracking = False
    l0.add_constraint(Ax=[[1.0]], lb=[1.0], ks=[2], soft=True)
    l0.add_constraint(Ax=[[2.0]], ub=[-2.0], ks=[2], soft=True)
    l0.setup()
    U0, *_ = l0.solve(l0.form_parameter([0.0]))
    x1 = U0[0]
    viol_hi = max(0.0, 1.0 - x1)
    viol_lo = max(0.0, 2.0 * x1 + 2.0)

    fin = MPC.from_discrete([[0.0]], [[1.0]], C=[[1.0]], Np=2, Nc=2)
    fin.set_bounds(umin=[-5.0], umax=[5.0])
    fin.set_objective(Q=[1e-6], R=[1e-6])
    fin.settings.reference_tracking = False
    fin.add_constraint(Ax=[[1.0]], lb=[1.0 - viol_hi - 1e-8], ks=[2])
    fin.add_constraint(Ax=[[2.0]], ub=[-2.0 + viol_lo + 1e-8], ks=[2])
    fin.add_constraint(Ax=[[4.0]], lb=[2.0], ks=[2], soft=True)
    fin.setup()
    U_ref, *_ = fin.solve(fin.form_parameter([0.0]))

    assert abs(U_lex[0] - U_ref[0]) < 2e-6          # matches sequential host ref
    assert abs(U_lex[0]) < 2e-6                     # level 0 balances at 0
    assert abs(U_prox[0] - U_lex[0]) > 1e-5         # proximal measurably differs

    # the batched entry dispatches through the same lexicographic path
    sol = mpc_lex.engine.solve_batch(np.tile(th, (4, 1)))
    assert np.allclose(np.asarray(sol.U)[:, 0], U_lex[0], atol=1e-9)
    assert np.all(np.asarray(sol.status) == 1)


def test_lexicographic_matches_proximal_when_unconflicted():
    """With no conflict the two modes agree (sanity: lexicographic layering
    does not change feasible solutions)."""
    def build(hier):
        mpc = MPC.from_discrete([[1.0]], [[1.0]], C=[[1.0]], Np=3, Nc=3)
        mpc.set_bounds(umin=[-5.0], umax=[5.0])
        mpc.set_objective(Q=[1.0], R=[0.1])
        mpc.add_constraint(Ax=[[1.0]], ub=[2.0], ks=[2, 3], soft=True, prio=0)
        mpc.add_constraint(Ax=[[1.0]], ub=[3.0], ks=[2, 3], soft=True, prio=1)
        mpc.settings.hierarchy = hier
        mpc.setup()
        return mpc
    a, b = build("lexicographic"), build("proximal")
    th = a.form_parameter([1.5], r=[0.0])
    Ua, *_ = a.solve(th)
    Ub, *_ = b.solve(th)
    assert np.allclose(Ua, Ub, atol=1e-5)


def test_single_level_unchanged():
    """Single-priority problems keep the plain soft weight."""
    mpc, _ = lmpc.mpc_examples("dcmotor")
    mpc.setup()
    rho = mpc.engine.ldp.rho_soft
    soft = mpc.engine.ldp.is_soft
    assert np.allclose(rho[soft], 1.0 / mpc.settings.soft_weight)
    assert np.all(rho[~soft] == 0.0)
