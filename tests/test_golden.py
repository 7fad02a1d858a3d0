"""Golden-value and cross-implementation consistency anchors.

The canonical anchor from the reference test suite
(test/runtests.jl:62-66,81,183,195): the inverted pendulum example at
x = [5, 5, 0, 0] must produce u = 1.7612519326 within 1e-6 on every
implementation path.
"""

import numpy as np
import pytest

import linearmpc_tpu as lmpc

GOLDEN_U = 1.7612519326


def test_invpend_golden_control():
    mpc, rng = lmpc.mpc_examples("invpend")
    u = mpc.compute_control([5.0, 5.0, 0.0, 0.0])
    assert np.linalg.norm(u - GOLDEN_U) < 1e-6


def test_invpend_golden_batched():
    """The batched device path must agree with the single-instance path."""
    mpc, rng = lmpc.mpc_examples("invpend")
    mpc.setup()
    theta = mpc.form_parameter([5.0, 5.0, 0.0, 0.0])
    thetas = np.tile(theta, (16, 1))
    sol = mpc.engine.solve_batch(thetas)
    U = np.asarray(sol.U)
    assert np.all(np.asarray(sol.status) == 1)
    assert np.max(np.abs(U[:, 0] - GOLDEN_U)) < 1e-6


def test_invpend_unconstrained_matches_lstsq():
    """With inactive constraints the QP solution is -H^-1 (f + f_theta theta);
    validates the LDP lowering independent of the active-set logic."""
    mpc, rng = lmpc.mpc_examples("invpend")
    mpc.setup()
    qp = mpc.mpQP
    theta = mpc.form_parameter([0.01, 0.0, 0.0, 0.0])
    U_expected = -np.linalg.solve(qp.H, qp.f + qp.f_theta @ theta)
    U, fval, flag, info = mpc.solve(theta)
    assert flag == 1
    assert np.allclose(U, U_expected, atol=1e-9)
