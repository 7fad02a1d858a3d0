"""Coverage for the masked-Cholesky solver path (m > subset-cache limit)
and the crazyflie stress example (prestab + terminal cost, 12 states)."""

import numpy as np

import linearmpc_tpu as lmpc
from linearmpc_tpu.mpc import MPC
from linearmpc_tpu.ops.reference_solver import solve_ldp_numpy


def test_large_m_cholesky_path_matches_reference():
    """invpend with state constraints: m exceeds the working-set cache, so
    the batched masked-Cholesky path runs; differential vs NumPy."""
    mpc, _ = lmpc.mpc_examples("invpend", 30, 8)
    mpc.add_constraint(Ax=np.eye(4), lb=-18 * np.ones(4), ub=18 * np.ones(4),
                       ks=range(2, 12))
    mpc.setup()
    assert mpc.engine.ldp.m > 12
    assert mpc.engine._subset_inv is None

    rng = np.random.default_rng(0)
    B = 64
    thetas = np.hstack([
        rng.uniform(-12, 12, (B, 4)), rng.uniform(-12, 12, (B, 2)),
        rng.uniform(-2, 2, (B, 1)),
    ])
    sol = mpc.engine.solve_batch(thetas)
    U = np.asarray(sol.U)
    assert np.all(np.asarray(sol.status) == 1)
    for i in range(B):
        Ur, *_, s = solve_ldp_numpy(mpc.engine.ldp, thetas[i])
        if s == 1:
            assert np.max(np.abs(U[i] - Ur)) < 1e-8


def test_large_m_active_state_constraints():
    """A state pushed against the added constraint must activate it."""
    mpc, _ = lmpc.mpc_examples("invpend", 30, 8)
    mpc.add_constraint(Ax=np.array([[1.0, 0, 0, 0]]), lb=[-6.0], ub=[6.0],
                       ks=range(2, 31))
    mpc.setup()
    theta = mpc.form_parameter([5.9, 3.0, 0.0, 0.0], uprev=[0.0])
    U, fval, flag, info = mpc.solve(theta)
    assert flag == 1
    assert info["active"].sum() > 0


def test_crazyflie_closed_loop():
    """12-state quadrotor with hover linearization, prestabilizing feedback
    and LQR terminal cost stabilizes from a tilted initial attitude
    (reference example src/mpc_examples.jl:451-531)."""
    ex = lmpc.mpc_example("crazyflie", 8, 8)
    mpc = ex.mpc
    sc = ex.scenarios[0]

    sim = lmpc.simulate_kw(mpc, x0=sc.x0, T=1.0)
    # attitude error decays toward hover
    assert np.max(np.abs(sim.xs[3:6, -1])) < 0.02
    assert np.max(np.abs(sim.xs[3:6, -1])) < np.max(np.abs(sim.xs[3:6, 0]))
    # thrust commands respect bounds
    assert sim.us.min() > -1e-9 and sim.us.max() < 1 + 1e-9


def test_inverse_update_bulk_matches_reference():
    """f32 bulk phase with O(m^2) recursive Woodbury inverse updates
    (DAQP's recursive-factorization analog) + f64 continuation must match
    the NumPy f64 reference like the Cholesky path does."""
    import jax.numpy as jnp

    mpc, _ = lmpc.mpc_examples("invpend", 30, 8)
    mpc.add_constraint(Ax=np.eye(4), lb=-18 * np.ones(4), ub=18 * np.ones(4),
                       ks=range(2, 12))
    mpc.setup(dtype=jnp.float32)  # polish=True -> inverse-update bulk
    assert mpc.engine._solve_kw["bulk_inverse_updates"]

    rng = np.random.default_rng(2)
    B = 48
    thetas = np.hstack([
        rng.uniform(-12, 12, (B, 4)), rng.uniform(-12, 12, (B, 2)),
        rng.uniform(-2, 2, (B, 1)),
    ])
    sol = mpc.engine.solve_batch(thetas)
    U = np.asarray(sol.U)
    status = np.asarray(sol.status)
    checked = 0
    for i in range(B):
        Ur, *_r, s = solve_ldp_numpy(mpc.engine.ldp, thetas[i])
        if s == 1:
            # every lane the sequential oracle certifies must converge
            # here too and agree (the device solver also certifies lanes
            # where the oracle stalls on degenerate sets -- not comparable)
            assert status[i] == 1, i
            assert np.max(np.abs(U[i] - Ur)) < 1e-8, i
            checked += 1
    assert checked >= B // 3
