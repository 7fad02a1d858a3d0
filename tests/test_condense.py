"""Structural/property tests on the condensation compiler, mirroring the
reference test suite (test/runtests.jl: 'Basic setup', 'MPC examples',
'Prestabilizing feedback', 'Move blocking', preprocessing tests)."""

import numpy as np
import pytest

import linearmpc_tpu as lmpc


def test_basic_setup():
    rng = np.random.default_rng(1234)
    A = rng.standard_normal((3, 3))
    B = rng.standard_normal((3, 1))
    C = np.array([[1.0, 0, 0], [0, 1.0, 0]])
    Bd = rng.standard_normal((3, 1))
    Dd = np.array([[1.0, 0], [0, 1.0]])
    mpc = lmpc.MPC.from_continuous(A, B, 0.1, C=C, Bd=Bd, Dd=Dd, Np=10, Nc=5)
    mpc.set_objective(Q=[1.0, 3.0], R=2 * np.eye(1), Rr=[[1.0]])
    mpc.set_bounds(umin=[-0.5], umax=[0.5])
    mpc.set_prestabilizing_feedback()
    mpc.set_output_bounds(ymin=[0.0, 0.0], ymax=[5.0, 1.0])
    mpc.setup()
    mpc.set_horizon(5)
    mpc.setup()
    mpc.update_settings(reference_tracking=False)
    assert mpc.mpQP is not None


@pytest.mark.parametrize(
    "name,kwargs",
    [
        ("invpend", {}),
        ("dcmotor", {}),
        ("aircraft", {}),
        ("nonlin", {}),
        ("mass", {"Np": 10, "Nc": 10, "params": {"nx": 2}}),
        ("chained", {"Np": 10, "Nc": 10, "params": {"nx": 2}}),
        ("invpend_contact", {"Np": 6, "Nc": 6, "params": {"nwalls": 1}}),
        ("satellite", {}),
        ("ballplate", {}),
        ("crazyflie", {"Np": 5, "Nc": 5}),
    ],
)
def test_examples_condense(name, kwargs):
    kwargs = dict(kwargs)
    Np = kwargs.pop("Np", None)
    Nc = kwargs.pop("Nc", None)
    ex = lmpc.mpc_example(name, Np, Nc, **kwargs)
    qp = lmpc.mpc2mpqp(ex.mpc)
    m, n = len(qp.bu), len(qp.f)
    assert n == ex.mpc.Nc * ex.mpc.model.nu
    assert qp.A.shape[1] == n
    assert qp.W.shape[0] == m
    assert np.all(qp.bu >= qp.bl - 1e-12)
    # H must be positive definite for the non-hybrid symmetric problems
    if qp.is_symmetric:
        assert np.linalg.eigvalsh((qp.H + qp.H.T) / 2).min() > 0


def test_example_api():
    ex = lmpc.mpc_example("dc_motor")
    assert ex.name == "DC Motor Position Control"
    assert len(ex.scenarios) > 0
    assert "dcmotor" in lmpc.mpc_example_names()
    ex2 = lmpc.mpc_example("mass-spring", 10, 10, nx=2)
    assert ex2.mpc.model.nx == 2


def test_prestabilizing_feedback():
    """Prestabilization must not change the control but must improve the
    conditioning of H (reference test/runtests.jl:119-136)."""
    A, B = np.array([[0.0, 1], [10, 0]]), np.array([[0.0], [1]])
    mpc = lmpc.MPC.from_continuous(A, B, 0.1, Np=30)
    mpc.set_bounds(umin=[-1.0], umax=[1.0])
    unom = mpc.compute_control(np.zeros(2), r=[1, 0])
    cond_nom = np.linalg.cond(lmpc.mpc2mpqp(mpc).H)

    mpc.set_prestabilizing_feedback()
    uprestab = mpc.compute_control(np.zeros(2), r=[1, 0])
    cond_prestab = np.linalg.cond(lmpc.mpc2mpqp(mpc).H)

    assert np.linalg.norm(unom - uprestab) < 1e-9
    assert cond_prestab < cond_nom


def test_move_blocking():
    """(reference test/runtests.jl:138-176)"""
    Np = 10
    mpc, _ = lmpc.mpc_examples("aircraft", Np)

    mpc.move_block([])
    qp = lmpc.mpc2mpqp(mpc)
    assert len(qp.f) == Np * mpc.model.nu

    mpc.move_block([1, 1, 2, 3, 3])
    qp = lmpc.mpc2mpqp(mpc)
    assert len(qp.f) == 5 * mpc.model.nu

    mpc.move_block([1, 1])  # pad
    lmpc.mpc2mpqp(mpc)
    assert mpc.move_blocks == [[1, 9], [1, 9]]

    mpc.move_block([2, 3, 3, 6, 8, 9])  # clip
    lmpc.mpc2mpqp(mpc)
    assert mpc.move_blocks == [[2, 3, 3, 2], [2, 3, 3, 2]]

    mpc.move_block(2)
    lmpc.mpc2mpqp(mpc)
    assert mpc.move_blocks == [[2, 2, 2, 2, 2], [2, 2, 2, 2, 2]]

    mpc.move_block(3)
    lmpc.mpc2mpqp(mpc)
    assert mpc.move_blocks == [[3, 3, 3, 1], [3, 3, 3, 1]]

    mpc.move_block([[1, 2, 3], [4, 2]])
    lmpc.mpc2mpqp(mpc)
    assert mpc.move_blocks == [[1, 2, 7], [4, 6]]

    mpc.move_block([[1, 2, 3, 15, 20], [2]])
    lmpc.mpc2mpqp(mpc)
    assert mpc.move_blocks == [[1, 2, 3, 4], [10]]


def test_move_blocking_control_matches_full_when_trivial():
    """A move block of all-ones must reproduce the unblocked Nc=Np control."""
    mpc, _ = lmpc.mpc_examples("invpend", 20, 20)
    u_full = mpc.compute_control([1.0, 0.5, 0.05, 0.0], uprev=[0.0])
    mpc.move_block([1] * mpc.Np)
    assert mpc.Nc == mpc.Np
    u_blocked = mpc.compute_control([1.0, 0.5, 0.05, 0.0], uprev=[0.0])
    assert np.linalg.norm(u_full - u_blocked) < 1e-8


def test_preprocessing_folds_simple_bounds():
    """General rows with a single coefficient must fold into simple bounds
    (reference test/runtests.jl:1306-1318)."""
    mpc, _ = lmpc.mpc_examples("invpend")
    # a redundant direct control bound as a general constraint
    mpc.add_constraint(Au=np.array([[2.0]]), lb=[-6.0], ub=[6.0], ks=range(1, mpc.Nc + 1))
    qp = lmpc.mpc2mpqp(mpc)
    # all general rows folded away -> only simple bounds remain
    assert qp.A.shape[0] == 0
    assert np.all(qp.bu[: mpc.Nc] <= 2.0 + 1e-12)


def test_parameter_names_dims():
    mpc, _ = lmpc.mpc_examples("invpend")
    nx, nr, nd, nuprev, np_ = mpc.get_parameter_dims()
    assert (nx, nr, nd, nuprev, np_) == (4, 2, 0, 1, 0)
    names = mpc.get_parameter_names()
    assert len(names) == nx + nr + nd + nuprev + np_
    assert names[:4] == ["x1", "x2", "x3", "x4"]
    assert names[4] == "y1r"
