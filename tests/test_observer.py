"""Observer behavior (reference test/runtests.jl:894-1103)."""

import numpy as np

import linearmpc_tpu as lmpc
from linearmpc_tpu.mpc import MPC


def test_observer_closed_loop_convergence():
    """(reference test/runtests.jl:894-922) noisy closed loop with a
    steady-state KF converges to the reference."""
    rng = np.random.default_rng(1234)
    mpc, _ = lmpc.mpc_examples("invpend", 100)
    mpc.move_block([1, 1, 5, 10, 10])
    mpc.set_state_observer(Q=1e2 * np.array([1e-3, 1, 1e-3, 1]), R=[1, 0.1])

    N = 2000
    rs = np.hstack([np.zeros((2, 20)), np.tile([[10.0], [0]], (1, N))])
    x = np.zeros(4)
    xs = np.zeros((4, N))
    mpc.state_observer.set_state(x)
    for k in range(N):
        xs[:, k] = x
        y = mpc.model.C @ x + np.array([0.05, 0.005]) * rng.standard_normal(2)
        mpc.state_observer.correct(y)
        u = mpc.compute_control(mpc.state_observer.x, r=rs[:, k])
        mpc.state_observer.predict(u)
        noise = np.array([[0, 0], [0.05, 0], [0, 0], [0, 0.005]]) @ rng.standard_normal(2)
        x = mpc.model.F @ x + mpc.model.G @ u + noise
    assert np.all(np.abs(xs[0, -50:] - 10) < 1.0)


def test_observer_with_disturbance():
    """(reference test/runtests.jl:951-962)"""
    rng = np.random.default_rng(7)
    F, G = np.array([[1.0, 1], [0, 1]]), np.array([[0.0], [1]])
    Gd = np.array([[1.0, 0], [0, 0]])
    Dd = np.array([[0.0, 1]])
    mpc = MPC.from_discrete(F, G, C=[[1.0, 0]], Gd=Gd, Dd=Dd)
    mpc.set_state_observer(Q=[1.0, 1], R=[1e-2])

    def get_measurement(x, d):
        return np.array([x[0] + d[1] + 0.01 * rng.standard_normal()])

    sim = lmpc.simulate_kw(mpc, x0=[1.0, 0], d=[1.0, 1.0], N=100, get_measurement=get_measurement)
    assert abs(np.mean(sim.ys[0, -21:])) < 1e-2


def test_offset_free_observer():
    """(reference test/runtests.jl:989-1011) velocity-form offset-free
    tracking removes the steady-state error a nominal controller has."""
    F, G = np.array([[1.0, 0.1], [0, 1]]), np.array([[0.005], [0.1]])
    C = np.array([[1.0, 0]])

    def dynamics(x, u, d):
        return F @ x + G @ np.atleast_1d(u) + np.array([0.01, 0.0])

    nominal = MPC.from_discrete(F, G, C=C, Ts=0.1, Np=20)
    nominal.set_objective(Q=[1.0], R=[0.0], Rr=[0.1])
    nominal.set_bounds(umin=[-1.0], umax=[1.0])
    sim_nominal = lmpc.simulate_kw(nominal, x0=np.zeros(2), N=100, r=[0.5], dynamics=dynamics)

    tracked = MPC.from_discrete(F, G, C=C, Ts=0.1, Np=20)
    tracked.set_objective(Q=[1.0], R=[0.0], Rr=[0.1])
    tracked.set_bounds(umin=[-1.0], umax=[1.0])
    obs = tracked.set_offset_free_observer(method="velocity", Q=[1e-3, 1e-3], R=[1e-4])
    sim_tracked = lmpc.simulate_kw(tracked, x0=np.zeros(2), N=100, r=[0.5], dynamics=dynamics)

    assert obs.formulation == "velocity"
    assert tracked.model.Gd.shape == (2, 1)
    assert tracked.model.Dd.shape == (1, 1)
    assert len(tracked.state_observer.estimated_disturbance()) == 1
    assert abs(sim_nominal.xs[0, -1] - 0.5) > 5e-2
    assert abs(sim_tracked.xs[0, -1] - 0.5) < 1e-3


def test_offset_free_observer_with_measured_disturbance():
    F, G = np.array([[1.0, 0.1], [0, 1]]), np.array([[0.005], [0.1]])
    C = np.array([[1.0, 0]])
    mpc = MPC.from_discrete(F, G, C=C, Gd=[[1.0], [0.0]], Ts=0.1, Np=20)
    mpc.set_objective(Q=[1.0], R=[0.0], Rr=[0.1])
    mpc.set_bounds(umin=[-1.0], umax=[1.0])
    mpc.set_offset_free_observer(method="velocity", Q=[1e-3, 1e-3], R=[1e-4])
    mpc.set_state(np.zeros(2))
    y = mpc.correct_state(np.zeros(1), [0.2])
    u = mpc.compute_control(y, r=[0.5], d=[0.2])
    assert len(u) == 1


def test_x0_uncertainty():
    """(reference test/runtests.jl:1067-1074) x0-uncertainty tightening
    offsets the achievable steady state."""
    F, G = np.array([[1.0, 0.1], [0, 1]]), np.array([[0.005], [0.1]])
    mpc = MPC.from_discrete(F, G, C=[[1.0, 0]], Ts=0.1, Np=25)
    mpc.set_bounds(umin=[-0.2], umax=[0.2], ymin=[-0.5], ymax=[0.5])
    mpc.set_x0_uncertainty(0.1 * np.ones(2))
    sim = lmpc.simulate_kw(mpc, r=[0.5])
    assert abs(sim.xs[0, -1] - 0.4) < 1e-6


def test_constant_offset():
    """(reference test/runtests.jl:1075-1085)"""
    rng = np.random.default_rng(1234)
    F, G = np.array([[1.0, 0.1], [0, 1]]), np.array([[0.005], [0.1]])
    mpc = MPC.from_discrete(F, G, C=[[1.0, 0]], Ts=0.1, Np=25, f_offset=[0.1, 0.1])
    mpc.set_objective(R=0 * np.eye(1), Rr=1 * np.eye(1), Q=1 * np.eye(1))
    mpc.set_bounds(umin=[-2], umax=[2], ymin=[-0.5], ymax=[0.5])
    mpc.set_state_observer(Q=1e-3 * np.eye(2))

    def dynamics(x, u, d):
        return mpc.model.F @ x + mpc.model.G @ np.atleast_1d(u) + np.array([0.1, 0.1])

    def get_measurement(x, d):
        return mpc.state_observer.C @ x + 0.01 * rng.standard_normal(1)

    sim = lmpc.simulate_kw(mpc, r=[0.5], dynamics=dynamics, get_measurement=get_measurement)
    assert np.all(np.abs(sim.xs[0, -50:] - 0.5) < 0.1)


def test_operating_points():
    """(reference test/runtests.jl:1086-1103)"""
    import jax.numpy as jnp

    def f(x, u, d):
        return jnp.array([x[0] - x[1], x[1] + u[0] - 1])

    xo, uo = np.array([0.5, 0.5]), np.array([0.5])
    model = lmpc.model_from_nonlinear(f, lambda x, u, d: jnp.asarray(x), xo, uo, Ts=0.1)
    mpc = lmpc.MPC(model, Np=100)
    mpc.settings.reference_tracking = False
    mpc.set_objective(Q=np.eye(2), R=np.eye(1), Rr=np.zeros((1, 1)))

    sim = lmpc.simulate_kw(mpc, x0=[0.1, 0], N=100)
    assert np.linalg.norm(sim.xs[:, -1] - xo) < 1e-4

    mpc.set_operating_point(xo=[1, 1], uo=[0])
    sim = lmpc.simulate_kw(mpc, x0=[0.1, 0], N=100)
    assert np.linalg.norm(sim.xs[:, -1] - np.array([1, 1])) < 1e-4


def test_set_offset():
    """(reference test/runtests.jl:1320-1327)"""
    mpc = MPC.from_discrete([[0.778800783]], [[1.0]], C=[[0.44239843385]])
    mpc.set_objective(Q=[1.0], R=[0.0], Rr=[0.1])
    mpc.set_offset(uo=[10.0], ho=[0.5])
    sim = lmpc.simulate_kw(mpc, x0=[0.0], r=[1.5], N=50)
    assert abs(sim.us[0, -1] - 10.5) < 1e-6
    assert abs(sim.ys[0, -1] - 1.5) < 1e-6


def test_unconstrained():
    """(reference test/runtests.jl:1329-1335)"""
    mpc = MPC.from_discrete([[0.77880078307]], [1.0], C=[[2.211992169]], Ts=100)
    mpc.move_block([2, 2, 2, 24])
    mpc.set_objective(Q=[1], Rr=[0], R=[0])
    sim = lmpc.simulate_kw(mpc, x0=np.zeros(1), r=[5], N=20)
    assert abs(sim.ys[0, -1] - 5.0) < 1e-6  # Julia isapprox rtol
