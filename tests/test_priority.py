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


def test_single_level_unchanged():
    """Single-priority problems keep the plain soft weight."""
    mpc, _ = lmpc.mpc_examples("dcmotor")
    mpc.setup()
    rho = mpc.engine.ldp.rho_soft
    soft = mpc.engine.ldp.is_soft
    assert np.allclose(rho[soft], 1.0 / mpc.settings.soft_weight)
    assert np.all(rho[~soft] == 0.0)
