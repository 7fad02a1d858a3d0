"""Reference/disturbance preview behavior (reference test/runtests.jl:224-512)."""

import numpy as np
import pytest

import linearmpc_tpu as lmpc
from linearmpc_tpu.mpc import MPC


def _mk_ref_preview_mpc():
    A = np.array([[0.0, 1], [10, 0]])
    B = np.array([[0.0], [1]])
    C = np.eye(2)
    mpc = MPC.from_continuous(A, B, 0.1, C=C, Np=5, Nc=3)
    mpc.set_bounds(umin=[-20.0], umax=[20.0])
    mpc.set_objective(Q=[1.0, 1.0], R=[0.1], Rr=[0.1])
    return mpc


def test_reference_preview_basic():
    mpc = _mk_ref_preview_mpc()
    assert mpc.settings.reference_preview is False
    u_std = mpc.compute_control([1.0, 0.0], r=[0.0, 0.0])
    assert len(u_std) == 1

    mpc.settings.reference_preview = True
    mpc.setup()
    u_single = mpc.compute_control([1.0, 0.0], r=[0.0, 0.0], uprev=[0.0])
    assert len(u_single) == 1

    r_traj = np.array([[0.0, 0.5, 1.0, 1.0, 1.0], [0.0, 0.0, 0.0, 0.0, 0.0]])
    u_preview = mpc.compute_control([1.0, 0.0], r=r_traj, uprev=[0.0])
    assert len(u_preview) == 1

    nx, nr, nd, nuprev, np_ = mpc.get_parameter_dims()
    assert (nx, nr, nd, nuprev) == (2, 10, 0, 1)

    r_dyn = np.array([[0.0, 1.0, 2.0, 1.0, 0.0], [0.0, 0.0, 0.5, 1.0, 0.5]])
    mpc.settings.reference_preview = False
    mpc.setup()
    u_no_preview = mpc.compute_control([1.0, 0.0], r=[0.0, 0.0], uprev=[0.0])
    mpc.settings.reference_preview = True
    mpc.setup()
    u_with_preview = mpc.compute_control([1.0, 0.0], r=r_dyn, uprev=[0.0])
    assert np.linalg.norm(u_no_preview - u_with_preview) > 1e-1


def test_reference_preview_errors():
    mpc = _mk_ref_preview_mpc()
    mpc.settings.reference_preview = True
    mpc.setup()
    with pytest.raises(ValueError):
        mpc.compute_control([1.0, 0.0], r=[0.0])
    with pytest.raises(ValueError):
        mpc.compute_control([1.0, 0.0], r=np.zeros((1, 3)))
    assert len(mpc.compute_control([1.0, 0.0], r=[0.0, 0.0])) == 1
    assert len(mpc.compute_control([1.0, 0.0], r=np.zeros((2, 2)))) == 1


def test_reference_preview_simulation():
    """(reference test/runtests.jl:276-327)"""
    A = np.array([[1.0, 1], [0, 1]])
    B = np.array([[0.0], [1]])
    C = np.eye(2)
    mpc = MPC.from_discrete(A, B, C=C, Np=5, Nc=3)
    mpc.set_bounds(umin=[-2.0], umax=[2.0], ymin=[-1.0, -0.5], ymax=[1.0, 0.5])
    mpc.set_objective(Q=[1.0, 1.0], R=[0.1])

    N_sim = 20
    r_traj = np.zeros((2, N_sim))
    r_traj[0, 10:] = 1.0

    mpc.settings.reference_preview = True
    mpc.setup()
    sim_preview = lmpc.simulate_kw(mpc, x0=[1.0, 0.0], N=N_sim, r=r_traj)
    assert sim_preview.xs.shape == (2, N_sim)
    assert sim_preview.us.shape == (1, N_sim)
    assert sim_preview.rs.shape == (2, N_sim)

    mpc.settings.reference_preview = False
    mpc.setup()
    sim_no_preview = lmpc.simulate_kw(mpc, x0=[1.0, 0.0], N=N_sim, r=r_traj)

    assert np.linalg.norm(sim_preview.us - sim_no_preview.us) > 1e-1
    e_preview = sim_preview.ys - sim_preview.rs
    e_no = sim_no_preview.ys - sim_no_preview.rs
    assert np.linalg.norm(e_preview) / np.linalg.norm(e_no) < 0.9
    assert np.linalg.norm(e_preview[:, -1]) < 1e-3
    assert np.linalg.norm(e_no[:, -1]) < 1e-3


def _mk_dist_preview_mpc():
    A = np.array([[1.0, 1], [0, 1]])
    B = np.array([[0.0], [1]])
    Gd = np.array([[0.0], [1]])
    C = np.array([[1.0, 0]])
    mpc = MPC.from_discrete(A, B, Gd=Gd, C=C, Np=5, Nc=5)
    mpc.set_bounds(umin=[-0.5], umax=[0.5])
    mpc.set_objective(Q=[10.0], R=[0.1])
    return mpc


def test_disturbance_preview():
    """(reference test/runtests.jl:349-382)"""
    mpc = _mk_dist_preview_mpc()
    assert mpc.settings.disturbance_preview is False
    u_std = mpc.compute_control([0.0, 0.0], d=[0.0])
    assert len(u_std) == 1

    mpc.settings.disturbance_preview = True
    mpc.setup()
    u_single = mpc.compute_control([0.0, 0.0], d=[0.0])
    d_traj = np.array([[0.0, 1.0, 1.0, 1.0, 1.0]])
    u_preview = mpc.compute_control([0.0, 0.0], d=d_traj)

    nx, nr, nd, nuprev, np_ = mpc.get_parameter_dims()
    assert (nx, nr, nd, nuprev) == (2, 1, 5, 0)

    assert u_preview[0] < u_single[0] - 1e-2
    assert np.linalg.norm(u_preview - u_single) > 1e-2


def test_disturbance_preview_simulation():
    """(reference test/runtests.jl:384-409)"""
    mpc = _mk_dist_preview_mpc()
    N_sim = 20
    d_traj = np.hstack([np.zeros((1, 8)), np.ones((1, 12))])

    mpc.settings.disturbance_preview = True
    mpc.setup()
    sim_preview = lmpc.simulate_kw(mpc, x0=[0.0, 0.0], N=N_sim, d=d_traj)

    mpc.settings.disturbance_preview = False
    mpc.setup()
    sim_no = lmpc.simulate_kw(mpc, x0=[0.0, 0.0], N=N_sim, d=d_traj)

    assert np.linalg.norm(sim_preview.us - sim_no.us) > 1e-2
    assert np.linalg.norm(sim_preview.ys) / np.linalg.norm(sim_no.ys) < 0.9


def test_disturbance_preview_errors():
    mpc = MPC.from_discrete([[1.0]], [[1.0]], Gd=[[1.0]], C=[[1.0]], Np=4, Nc=4)
    mpc.set_bounds(umin=[-2.0], umax=[2.0])
    mpc.set_objective(Q=[1.0], R=[0.1])
    mpc.settings.disturbance_preview = True
    mpc.setup()
    with pytest.raises(ValueError):
        mpc.compute_control([0.0], d=[0.0, 1.0])
    with pytest.raises(ValueError):
        mpc.compute_control([0.0], d=np.ones((2, 2)))
    assert len(mpc.compute_control([0.0], d=[0.0])) == 1
    assert len(mpc.compute_control([0.0], d=np.array([[0.0, 1.0]]))) == 1


def test_disturbance_preview_multiple():
    """(reference test/runtests.jl:424-452)"""
    A = np.diag([0.9, 0.8])
    B = np.array([[1.0], [0.0]])
    Gd = np.eye(2)
    C = np.eye(2)
    mpc = MPC.from_discrete(A, B, Gd=Gd, C=C, Np=4, Nc=4)
    mpc.set_bounds(umin=[-2.0], umax=[2.0])
    mpc.set_objective(Q=[1.0, 1.0], R=[0.1])
    mpc.settings.disturbance_preview = True
    mpc.setup()

    nx, nr, nd, nuprev, np_ = mpc.get_parameter_dims()
    assert nd == 2 * 4

    u_const = mpc.compute_control([0.0, 0.0], d=[0.5, -0.3])
    d_traj = np.array([[0.0, 0.5, 1.0, 1.0], [0.0, 0.0, -0.5, -0.5]])
    u_traj = mpc.compute_control([0.0, 0.0], d=d_traj)
    assert np.linalg.norm(u_traj - u_const) > 1e-5


def test_combined_previews():
    """(reference test/runtests.jl:454-491)"""
    A = np.array([[1.0, 1], [0, 1]])
    B = np.array([[0.0], [1]])
    Gd = np.array([[0.5], [0.0]])
    C = np.array([[1.0, 0]])
    mpc = MPC.from_discrete(A, B, Gd=Gd, C=C, Np=5, Nc=5)
    mpc.set_bounds(umin=[-2.0], umax=[2.0])
    mpc.set_objective(Q=[10.0], R=[0.1])
    mpc.settings.reference_preview = True
    mpc.settings.disturbance_preview = True
    mpc.setup()

    nx, nr, nd, nuprev, np_ = mpc.get_parameter_dims()
    assert (nr, nd) == (5, 5)

    r_traj = np.linspace(0, 1, 5)[None, :]
    d_traj = np.array([[0.0, 0.2, 0.4, 0.4, 0.4]])
    u = mpc.compute_control([0.0, 0.0], r=r_traj, d=d_traj)
    assert len(u) == 1
    u2 = mpc.compute_control([0.0, 0.0], r=r_traj, d=np.zeros((1, 5)))
    assert np.linalg.norm(u - u2) > 1e-6
