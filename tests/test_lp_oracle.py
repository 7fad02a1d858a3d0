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
