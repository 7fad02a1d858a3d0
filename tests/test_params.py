"""Generalized (affine) parameters in objective and constraints
(reference test/runtests.jl:1105-1275) and formatting helpers (:1401-1428)."""

import numpy as np
import pytest

import linearmpc_tpu as lmpc
from linearmpc_tpu.mpc import MPC
from linearmpc_tpu.utils.formatting import (
    format_affine_parameters,
    format_disturbance,
    format_reference,
)


def test_params_in_objective():
    A = np.array([[1.0, 1], [0, 1]])
    B = np.array([[0.0], [1]])
    mpc = MPC.from_discrete(A, B, C=np.eye(2), Np=5, Nc=3)
    mpc.set_bounds(umin=[0.0], umax=[2.0])
    mpc.set_objective(Q=[1.0, 1.0], R=[0.1], Eu=[[1.0]])
    mpc.setup()

    assert mpc.get_parameter_dims() == (2, 2, 0, 0, 1)

    u_no = mpc.compute_control([-1.0, 0.0], r=[0.0, 0.0])
    u_zero = mpc.compute_control([-1.0, 0.0], r=[0.0, 0.0], p=np.zeros(1))
    u_pos = mpc.compute_control([-1.0, 0.0], r=[0.0, 0.0], p=[1.0])
    u_neg = mpc.compute_control([-1.0, 0.0], r=[0.0, 0.0], p=[-1.0])

    assert np.allclose(u_zero, u_no)
    assert u_pos[0] < u_zero[0] < u_neg[0]

    u_traj = mpc.compute_control([-1.0, 0.0], r=[0.0, 0.0], p=np.ones((1, 5)))
    assert np.allclose(u_traj, u_pos)


def test_param_preview():
    A = np.array([[1.0, 1], [0, 1]])
    B = np.array([[0.0], [1]])
    mpc = MPC.from_discrete(A, B, C=np.eye(2), Np=5, Nc=3)
    mpc.set_bounds(umin=[-2.0], umax=[2.0])
    mpc.set_objective(Q=[1.0, 1.0], R=[0.1], Eu=[[1.0]])
    mpc.settings.parameter_preview = True
    mpc.setup()

    assert mpc.get_parameter_dims() == (2, 2, 0, 0, 5)
    assert np.allclose(format_affine_parameters(mpc, [0.25]), np.full(5, 0.25))
    assert np.allclose(
        format_affine_parameters(mpc, np.array([[0.25, 0.5]])), [0.25, 0.5, 0.5, 0.5, 0.5]
    )

    u_const = mpc.compute_control([-1.0, 0.0], r=[0.0, 0.0], p=[1.0])
    u_preview = mpc.compute_control([-1.0, 0.0], r=[0.0, 0.0], p=np.array([[1.0, 0, 0, 0, 0]]))
    assert np.linalg.norm(u_const - u_preview) > 1e-3


def test_params_in_state_objective():
    mpc = MPC.from_discrete([[1.0]], [[1.0]], C=[[1.0]], Np=4, Nc=4)
    mpc.set_bounds(umin=[-2.0], umax=[2.0])
    # R=1 keeps the nominal solution interior so the ordering is strict
    mpc.set_objective(Q=[0.0], R=[1.0], Ex=[[1.0]], ex=[0.1])
    mpc.setup()

    assert mpc.get_parameter_dims() == (1, 1, 0, 0, 1)
    u_nom = mpc.compute_control([1.0], r=[0.0], p=[0.0])
    u_pos = mpc.compute_control([1.0], r=[0.0], p=[1.0])
    u_neg = mpc.compute_control([1.0], r=[0.0], p=[-1.0])
    u_traj = mpc.compute_control([1.0], r=[0.0], p=np.ones((1, 4)))
    assert u_pos[0] < u_nom[0] < u_neg[0]
    assert np.allclose(u_traj, u_pos)


def test_params_in_constraints():
    """(reference test/runtests.jl:1250-1275)"""
    mpc = MPC.from_discrete([[1.0]], [[1.0]], C=[[1.0]], Np=4, Nc=4)
    mpc.set_bounds(umin=[0.0], umax=[2.0])
    mpc.set_objective(Q=[0.0], R=[1e-6], Eu=[[-1.0]], eu=[-0.1])
    mpc.add_constraint(Au=[[1.0]], Ap=[[1.0]], ub=[1.0], ks=range(1, mpc.Np + 1))
    mpc.setup()

    assert mpc.get_parameter_dims() == (1, 1, 0, 0, 1)
    assert np.allclose(format_affine_parameters(mpc, [0.25]), [0.25])
    assert np.allclose(format_affine_parameters(mpc, np.array([[0.25, 0.5]])), [0.25])

    u_nom = mpc.compute_control([0.0], r=[0.0], p=[0.0])
    u_tight = mpc.compute_control([0.0], r=[0.0], p=[0.75])
    u_preview = mpc.compute_control([0.0], r=[0.0], p=np.array([[0.75, 0, 0, 0]]))
    assert abs(u_nom[0] - 1.0) < 1e-6
    assert abs(u_tight[0] - 0.25) < 1e-6
    assert np.allclose(u_preview, u_tight)

    pr = mpc.parameter_range()
    assert len(pr.pmin) == 1
    assert np.allclose(pr.lower(), np.concatenate([pr.xmin, pr.rmin, pr.dmin, pr.umin, pr.pmin]))


def test_param_simulation():
    """(reference test/runtests.jl:1157-1191)"""
    A = np.array([[0.0, -0.37], [0.37, 0.74]])
    B = np.array([[0.37], [0.26]])
    mpc = MPC.from_discrete(A, B, C=np.eye(2), Np=5, Nc=3)
    mpc.set_bounds(umin=[-2.0], umax=[2.0])
    mpc.set_objective(Q=[1.0, 1.0], R=[0.1], Eu=[[1.0]])
    mpc.setup()

    N_sim = 20
    p_traj = -0.5 * np.ones((1, N_sim))
    r_traj = np.zeros((2, N_sim))
    sim_p = lmpc.simulate_kw(mpc, x0=[1.0, 0.0], N=N_sim, r=r_traj, p=p_traj)
    sim_no = lmpc.simulate_kw(mpc, x0=[1.0, 0.0], N=N_sim, r=r_traj)

    def cost(sim):
        return (
            np.sum(sim.xs**2)
            + 0.1 * np.sum(sim.us**2)
            + np.sum(sim.us * p_traj)
        )

    assert cost(sim_p) < cost(sim_no)
    assert sim_p.us[0, -1] > 0.1


def test_format_reference_helpers():
    """(reference test/runtests.jl:1401-1416)"""
    mpc = MPC.from_discrete([[1.0, 1], [0, 1]], [[0.0], [1]], C=np.eye(2), Np=4, Nc=4)
    mpc.set_objective(Q=[1.0, 1.0], R=[1.0])

    mpc.settings.reference_preview = True
    assert np.allclose(format_reference(mpc, [1.0, 2.0]), np.tile([1.0, 2.0], 4))
    r = np.array([[1.0, 2, 3, 4, 5], [10.0, 20, 30, 40, 50]])
    assert np.allclose(format_reference(mpc, r), [1, 10, 2, 20, 3, 30, 4, 40])
    r2 = np.array([[1.0, 2], [10.0, 20]])
    assert np.allclose(format_reference(mpc, r2), [1, 10, 2, 20, 2, 20, 2, 20])
    with pytest.raises(ValueError):
        format_reference(mpc, [1.0])
    with pytest.raises(ValueError):
        format_reference(mpc, np.ones((1, 2)))

    mpc.settings.reference_preview = False
    assert np.allclose(format_reference(mpc, np.array([[7.0, 8, 9], [1.0, 2, 3]])), [7.0, 1.0])


def test_format_disturbance_helpers():
    """(reference test/runtests.jl:1418-1428)"""
    mpc = MPC.from_discrete([[1.0]], [[1.0]], Gd=[[1.0]], C=[[1.0]], Np=4, Nc=4)
    mpc.set_objective(Q=[1.0], R=[1.0])
    mpc.settings.disturbance_preview = True
    assert np.allclose(format_disturbance(mpc, [3.0]), [3.0] * 4)
    assert np.allclose(format_disturbance(mpc, np.array([[1.0, 2.0]])), [1.0, 2.0, 2.0, 2.0])
    with pytest.raises(ValueError):
        format_disturbance(mpc, [1.0, 2.0])
    with pytest.raises(ValueError):
        format_disturbance(mpc, np.ones((2, 2)))
    mpc.settings.disturbance_preview = False
    assert np.allclose(format_disturbance(mpc, np.array([[7.0, 8, 9]])), [7.0])


def test_format_disturbance_nd0():
    """(reference test/runtests.jl:555-564)"""
    mpc = MPC.from_discrete([[1.0]], [[1.0]], C=[[1.0]], Np=4, Nc=4)
    mpc.settings.disturbance_preview = True
    assert format_disturbance(mpc, None).size == 0
