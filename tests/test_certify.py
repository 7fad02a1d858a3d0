"""Iteration-complexity certification (reference test/runtests.jl:199-204).

The full example-range certification (8900+ regions, minutes of LPs) is
marked slow; CI runs a reduced parameter box that still yields a complete
certificate with >100 regions.
"""

import numpy as np
import pytest

import linearmpc_tpu as lmpc
from linearmpc_tpu.certify import certify
from linearmpc_tpu.ops.reference_solver import solve_ldp_numpy
from linearmpc_tpu.types import ParameterRange


def _small_range(mpc, scale=6.0):
    rng = ParameterRange.from_mpc(mpc)
    for name in ("xmin", "rmin", "dmin", "umin", "pmin"):
        getattr(rng, name)[:] = -scale
    for name in ("xmax", "rmax", "dmax", "umax", "pmax"):
        getattr(rng, name)[:] = scale
    return rng


def test_certify_invpend_partition():
    """Pendulum over a reduced box: finite bound, >100 regions."""
    mpc, _ = lmpc.mpc_examples("invpend")
    rng = _small_range(mpc)
    result = certify(mpc, prange=rng)
    assert not result.exhausted
    assert result.max_iterations > 0
    assert len(result.partition) > 100


def test_certified_bound_holds_on_samples():
    """The certified worst case must dominate observed iteration counts."""
    mpc, _ = lmpc.mpc_examples("invpend")
    rng_box = _small_range(mpc)
    result = certify(mpc, prange=rng_box)
    lb, ub = rng_box.lower(), rng_box.upper()
    rng = np.random.default_rng(11)
    worst = 0
    for _ in range(300):
        theta = lb + (ub - lb) * rng.random(len(lb))
        _, _, _, it, status = solve_ldp_numpy(mpc.engine.ldp, theta)
        if status == 1:
            worst = max(worst, it)
    assert worst <= result.max_iterations


def test_certify_invpend_full_range():
    """Complete certificate over the example's published range
    (reference test/runtests.jl:199-204 asserts >100 regions).
    Promoted from the slow set in round 4: the wave-batched oracle
    brought it from minutes of host LPs to ~1 min."""
    mpc, rng = lmpc.mpc_examples("invpend")
    result = certify(mpc, prange=rng)
    assert not result.exhausted
    assert len(result.partition) > 100
