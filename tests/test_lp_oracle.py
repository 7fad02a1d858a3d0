"""Batched interior-point LP feasibility oracle vs scipy/HiGHS
(ops/lp_ipm.py -- the device replacement for per-region host LPs in
explicit enumeration and certification)."""

import numpy as np

import linearmpc_tpu as lmpc
from linearmpc_tpu.explicit import _chebyshev_radius, build_explicit
from linearmpc_tpu.ops.lp_ipm import chebyshev_batch


def test_chebyshev_batch_matches_highs():
    rng = np.random.default_rng(0)
    B, m, nth = 64, 24, 7
    lb, ub = -10 * np.ones(nth), 10 * np.ones(nth)
    As = np.zeros((B, m, nth))
    bs = np.ones((B, m))
    for i in range(B):
        k = rng.integers(5, m)
        A = rng.standard_normal((k, nth))
        A /= np.linalg.norm(A, axis=1, keepdims=True)
        # mixed feasible/empty instances
        bs[i, :k] = A @ rng.uniform(-5, 5, nth) + rng.uniform(-0.5, 2.0, k)
        As[i, :k] = A
    r, c, gap = chebyshev_batch(As, bs, lb, ub)
    assert np.all(np.isfinite(gap))
    for i in range(B):
        if gap[i] > 1e-9:
            continue  # contract: callers route stalled lanes to the host LP
        A = As[i][np.abs(As[i]).sum(1) > 0]
        b = bs[i][: len(A)]
        r_ref, _c = _chebyshev_radius(A, b, lb, ub)
        if r_ref == -np.inf:
            assert r[i] < 1e-7, i
        else:
            assert abs(r[i] - r_ref) < 1e-7, (i, r[i], r_ref)
            # returned center must be feasible with margin ~r
            assert np.max(A @ c[i] - b) <= -r_ref + 1e-6


def test_explicit_oracle_paths_agree():
    """Batch-oracle enumeration must produce the identical region set as
    the serial HiGHS path when enumeration completes."""
    mpc, _ = lmpc.mpc_examples("invpend")
    mpc.setup()
    pr = mpc.parameter_range()
    e_b = build_explicit(mpc, prange=pr, oracle="batch")
    e_h = build_explicit(mpc, prange=pr, oracle="host")
    sb = sorted(cr.active_set for cr in e_b.regions)
    sh = sorted(cr.active_set for cr in e_h.regions)
    assert sb == sh
    assert len(sb) > 50


def test_numpy_ipm_matches_jitted():
    """The NumPy twin (small-batch fast path) and the jitted IPM must
    produce the same radii/centers on identical chunks."""
    import jax
    import jax.numpy as jnp

    from linearmpc_tpu.ops.lp_ipm import _ipm_numpy, lp_ipm_batch

    rng = np.random.default_rng(4)
    B, m, n = 32, 12, 4
    A = rng.normal(size=(B, m, n))
    b = np.abs(rng.normal(size=(B, m))) + 0.5
    # box rows keep every instance bounded (as production callers do --
    # a random cone is often unbounded and the twins then diverge freely)
    box = np.concatenate([np.eye(n), -np.eye(n)])
    A = np.concatenate([A, np.broadcast_to(box, (B, 2 * n, n))], axis=1)
    b = np.concatenate([b, np.full((B, 2 * n), 5.0)], axis=1)
    c = rng.normal(size=(B, n))
    x0 = np.zeros((B, n))  # strictly feasible: A@0 = 0 < b
    xn, objn, gapn, rdn = _ipm_numpy(A, b, c, x0, 40)
    xj, objj, gapj, rdj = lp_ipm_batch(
        jnp.asarray(A), jnp.asarray(b), jnp.asarray(c), jnp.asarray(x0),
        n_iter=40)
    assert np.max(np.abs(xn - np.asarray(xj))) < 1e-8
    assert np.max(np.abs(objn - np.asarray(objj))) < 1e-8
