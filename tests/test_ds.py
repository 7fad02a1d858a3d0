"""Double-single (compensated f32) arithmetic and polish-tier accuracy.

The TPU Pallas path finishes solves in double-single float32 (ops/ds.py,
ops/ds_polish.py) instead of emulated float64; these tests pin the
precision claims on the CPU backend (f32 ops are IEEE on both backends).
"""

import jax.numpy as jnp
import numpy as np

import linearmpc_tpu as lmpc
from linearmpc_tpu.ops.ds import DS, ds_matvec, split_f64, two_prod, two_sum
from linearmpc_tpu.ops.ds_polish import make_dsldp, polish_batch_ds
from linearmpc_tpu.ops.ldp import precompute_subset_inverses


def test_error_free_transforms_exact():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(4096).astype(np.float32) * 10.0 ** rng.integers(-6, 6, 4096)
    b = rng.standard_normal(4096).astype(np.float32) * 10.0 ** rng.integers(-6, 6, 4096)
    s, e = two_sum(jnp.asarray(a), jnp.asarray(b))
    exact = a.astype(np.float64) + b.astype(np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    # two_sum is exact whenever s itself did not round (always for f32+f32
    # representable sums); allow one ulp of the error term otherwise
    assert np.max(np.abs(got - exact) / np.maximum(np.abs(exact), 1e-30)) < 1e-14

    p, pe = two_prod(jnp.asarray(a), jnp.asarray(b))
    exact = a.astype(np.float64) * b.astype(np.float64)
    got = np.asarray(p, np.float64) + np.asarray(pe, np.float64)
    assert np.max(np.abs(got - exact) / np.maximum(np.abs(exact), 1e-30)) < 1e-14


def test_ds_matvec_precision():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((12, 9))
    x = rng.standard_normal((256, 9))
    out = ds_matvec(DS(*map(jnp.asarray, (A.astype(np.float32),
                                          (A - A.astype(np.float32)).astype(np.float32)))),
                    split_f64(jnp.asarray(x)))
    got = np.asarray(out.to_f64())
    ref = x @ A.T
    assert np.max(np.abs(got - ref)) < 1e-12


def test_ds_polish_matches_f64_solution():
    mpc, _ = lmpc.mpc_examples("invpend")
    mpc.setup()
    engine = mpc.engine

    rng = np.random.default_rng(1234)
    B = 256
    thetas = np.hstack([
        rng.uniform(-20, 20, (B, 4)),
        rng.uniform(-20, 20, (B, 2)),
        rng.uniform(-2, 2, (B, 1)),
    ])
    sol = engine.solve_batch(jnp.asarray(thetas))  # float64 CPU path
    assert np.all(np.asarray(sol.status) == 1)

    dsl = make_dsldp(engine.ldp, precompute_subset_inverses(engine.ldp))
    U, lam, fval, bad = polish_batch_ds(
        dsl, jnp.asarray(thetas), jnp.asarray(sol.active), jnp.asarray(sol.side)
    )
    err_U = np.max(np.abs(np.asarray(U.to_f64()) - np.asarray(sol.U)))
    err_lam = np.max(np.abs(np.asarray(lam.to_f64()) - np.asarray(sol.lam)))
    assert err_U < 1e-10, err_U
    assert err_lam < 1e-10, err_lam
    # optimal working sets must read as clean, suboptimal ones as dirty
    assert np.max(np.asarray(bad)) < 1e-8
    wrong_act = np.asarray(sol.active).copy()
    wrong_act[:, 0] = ~wrong_act[:, 0]
    *_ignored, bad_wrong = polish_batch_ds(
        dsl, jnp.asarray(thetas), jnp.asarray(wrong_act), jnp.asarray(sol.side)
    )
    assert np.mean(np.asarray(bad_wrong) > 1e-8) > 0.5


def test_polish_pallas_interpret_matches_xla_ds():
    """The fused Pallas polish kernel (interpret mode on CPU) must agree
    with the XLA double-single polish and the f64 solution."""
    from linearmpc_tpu.ops.pallas_polish import make_polish_data, polish_pallas

    mpc, _ = lmpc.mpc_examples("invpend")
    mpc.setup()
    engine = mpc.engine

    rng = np.random.default_rng(7)
    B = 128
    thetas = np.hstack([
        rng.uniform(-20, 20, (B, 4)),
        rng.uniform(-20, 20, (B, 2)),
        rng.uniform(-2, 2, (B, 1)),
    ])
    sol = engine.solve_batch(jnp.asarray(thetas))
    assert np.all(np.asarray(sol.status) == 1)
    act = jnp.asarray(sol.active)
    side = jnp.asarray(sol.side)

    subset_inv = precompute_subset_inverses(engine.ldp)
    dsl = make_dsldp(engine.ldp, subset_inv)
    U_x, lam_x, fval_x, bad_x = polish_batch_ds(dsl, jnp.asarray(thetas), act, side)

    pd = make_polish_data(engine.ldp, subset_inv)
    U_p, lam_p, fval_p, bad_p = polish_pallas(pd, jnp.asarray(thetas), act, side, interpret=True)

    assert np.max(np.abs(np.asarray(U_p.to_f64()) - np.asarray(U_x.to_f64()))) < 1e-11
    assert np.max(np.abs(np.asarray(lam_p.to_f64()) - np.asarray(lam_x.to_f64()))) < 1e-11
    fx = np.asarray(fval_x.to_f64())
    fp = np.asarray(fval_p.to_f64())
    assert np.max(np.abs(fp - fx) / np.maximum(np.abs(fx), 1.0)) < 1e-11
    assert np.max(np.abs(np.asarray(U_p.to_f64()) - np.asarray(sol.U))) < 1e-10
    assert np.max(np.asarray(bad_p)) < 1e-8
    # badness must flag a corrupted working set
    wrong = np.asarray(sol.active).copy()
    wrong[:, 1] = ~wrong[:, 1]
    *_ig, bad_w = polish_pallas(pd, jnp.asarray(thetas), jnp.asarray(wrong), side, interpret=True)
    assert np.mean(np.asarray(bad_w) > 1e-8) > 0.5
