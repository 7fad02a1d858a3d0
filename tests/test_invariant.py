"""Invariant sets vs textbook examples BBM17 10.12/10.13
(reference test/runtests.jl:206-222)."""

import numpy as np

from linearmpc_tpu.invariant import eliminate, invariant_set, minrep


def test_invariant_bbm_10_12():
    F = np.array([[0.5, 0.0], [1.0, -0.5]])
    H, h = invariant_set(F, -10 * np.ones(2), 10 * np.ones(2),
                         wmin=-np.ones(2), wmax=np.ones(2), eps_shrink=0.0)
    assert np.linalg.norm(np.sort(h) - np.sort([10.0, 10, 10, 10, 8.05, 8.05])) < 1e-1


def test_invariant_bbm_10_13():
    F = np.array([[1.5, 0.0], [1.0, -1.5]])
    G = np.array([[1.0], [0.0]])
    H, h = invariant_set(F, -10 * np.ones(2), 10 * np.ones(2),
                         G=G, umin=[-5.0], umax=[5.0],
                         wmin=-0.1 * np.ones(2), wmax=0.1 * np.ones(2), eps_shrink=0.0)
    assert np.linalg.norm(np.sort(h) - np.sort([3.72, 3.72, 2.008, 2.008])) < 1e-2


def test_invariant_set_is_invariant():
    """Property: F x stays inside for sampled boundary points."""
    F = np.array([[0.9, 0.2], [-0.1, 0.8]])
    H, h = invariant_set(F, -np.ones(2), np.ones(2))
    rng = np.random.default_rng(0)
    for _ in range(200):
        x = rng.uniform(-1, 1, 2)
        # scale onto the boundary
        s = np.max(H @ x / h)
        if s <= 0:
            continue
        xb = x / s * 0.999
        assert np.all(H @ (F @ xb) <= h + 1e-9)


def test_minrep_drops_redundant():
    A = np.array([[1.0, 0], [0, 1], [-1, 0], [0, -1], [1, 1]])
    b = np.array([1.0, 1, 1, 1, 5.0])  # last row redundant
    A2, b2, kept = minrep(A, b)
    assert len(b2) == 4


def test_eliminate_projection():
    # box in 3D projected to 2D
    A = np.vstack([np.eye(3), -np.eye(3)])
    b = np.ones(6)
    A2, b2 = eliminate(A, b, [2])
    # result must describe the unit box in 2D
    rng = np.random.default_rng(1)
    for _ in range(100):
        x = rng.uniform(-1.5, 1.5, 2)
        inside = np.all(np.abs(x) <= 1)
        assert inside == bool(np.all(A2 @ x <= b2 + 1e-9))
