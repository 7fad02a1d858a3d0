"""Fused Pallas TPU kernel for the double-single finishing tier.

The XLA version of the compensated-f32 polish (ops/ds_polish.py) runs in
batch-major (B, m) layout, where the minor dimension m pads to the 128-wide
vector lane, wasting ~96% of every VPU op and materializing padded
intermediates; measured at ~7 ms per 32k-lane batch it dominated the solve.
Here the entire tier -- bound transform, working-set KKT solve via the
gathered precomputed inverse, primal recovery, objective, and KKT residual
-- is ONE gridless lane-major kernel (every per-lane vector is a (rows, B)
block with the batch in the lane dimension), the same shape discipline as
the bulk-phase kernel (ops/pallas_solver.py).

Double-single arithmetic (see ops/ds.py for the math and references) is
straight-line f32 inside the kernel: Mosaic has no FMA, so two_prod uses
Veltkamp splitting; matrix contractions unroll over the small static
dimension (<= max(m, n_theta)) as elementwise row operations. The MXU is
used only for *exact* products: one-hot gathers of the subset-inverse table
and ones-column row expansion.

Mosaic constraints honored (CLAUDE.md): gridless single-shot call, no
in-kernel loops (all Python-unrolled), np.float32 scalar literals,
first-hit/arithmetic masks instead of argmax, (1, B) rows expanded through
explicit ones-column matmuls, captured arrays passed as kernel inputs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ds import DS, split_f64, split_f64_np
from .ldp import LDPData

LANES = 128
_SPLITTER = np.float32(4097.0)


class PolishData(NamedTuple):
    """Static kernel inputs, pre-split into f32 hi/lo pairs (host-side).

    ``sub`` is the subset-inverse table flattened column-major -- row
    k*m + i of column s holds inv[s][i, k] -- so a contiguous (m, B) slice
    k*m:(k+1)*m is column k of every lane's gathered inverse.
    """

    sub_hi: jnp.ndarray   # (m*m, 2^m)
    sub_lo: jnp.ndarray
    G_hi: jnp.ndarray     # (m*m, 1) column-stacked: rows k*m:(k+1)*m = col k
    G_lo: jnp.ndarray
    Dth_hi: jnp.ndarray   # (nth*m, 1) column-stacked
    Dth_lo: jnp.ndarray
    du_hi: jnp.ndarray    # (m, 1)
    du_lo: jnp.ndarray
    dl_hi: jnp.ndarray    # (m, 1)
    dl_lo: jnp.ndarray
    HET_hi: jnp.ndarray   # (m*n, 1) column-stacked H^-1 E'
    HET_lo: jnp.ndarray
    Uth_hi: jnp.ndarray   # (nth*n, 1) column-stacked
    Uth_lo: jnp.ndarray
    uo_hi: jnp.ndarray    # (n, 1)
    uo_lo: jnp.ndarray
    H_hi: jnp.ndarray     # (n*n, 1) column-stacked
    H_lo: jnp.ndarray
    f_hi: jnp.ndarray     # (n, 1)
    f_lo: jnp.ndarray
    fth_hi: jnp.ndarray   # (nth*n, 1) column-stacked
    fth_lo: jnp.ndarray
    eq: jnp.ndarray       # (m, 1) f32
    immut: jnp.ndarray    # (m, 1) f32


def make_polish_data(ldp: LDPData, subset_inv: np.ndarray) -> PolishData:
    m = ldp.m
    sub = subset_inv.transpose(0, 2, 1).reshape(2**m, m * m).T  # [k*m+i, s]
    sp = split_f64_np
    col = lambda a: np.asarray(a, dtype=np.float64).reshape(-1, 1)
    # column-stacked: (r, c) -> (c*r, 1) with rows j*r:(j+1)*r = column j,
    # so the kernel takes sublane slices only (Mosaic-safe)
    cs = lambda a: np.asarray(a, dtype=np.float64).T.reshape(-1, 1)
    sub_hi, sub_lo = sp(sub)
    G_hi, G_lo = sp(cs(ldp.G))
    Dth_hi, Dth_lo = sp(cs(ldp.Dth))
    du_hi, du_lo = sp(col(ldp.du))
    dl_hi, dl_lo = sp(col(ldp.dl))
    HET_hi, HET_lo = sp(cs(ldp.HinvET))
    Uth_hi, Uth_lo = sp(cs(ldp.Uth_off))
    uo_hi, uo_lo = sp(col(ldp.u_off))
    H_hi, H_lo = sp(cs(ldp.H))
    f_hi, f_lo = sp(col(ldp.f))
    fth_hi, fth_lo = sp(cs(ldp.f_theta))
    j = jnp.asarray
    return PolishData(
        j(sub_hi), j(sub_lo), j(G_hi), j(G_lo), j(Dth_hi), j(Dth_lo),
        j(du_hi), j(du_lo), j(dl_hi), j(dl_lo), j(HET_hi), j(HET_lo),
        j(Uth_hi), j(Uth_lo), j(uo_hi), j(uo_lo), j(H_hi), j(H_lo),
        j(f_hi), j(f_lo), j(fth_hi), j(fth_lo),
        j(np.asarray(ldp.is_eq, np.float32).reshape(-1, 1)),
        j(np.asarray(ldp.is_immutable, np.float32).reshape(-1, 1)),
    )


# -- straight-line double-single primitives (f32 tensors inside the kernel) --

def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _quick(a, b):
    s = a + b
    return s, b - (s - a)


def _split(a):
    t = _SPLITTER * a
    h = t - (t - a)
    return h, a - h


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def _ds_add(xh, xl, yh, yl):
    s, e = _two_sum(xh, yh)
    return _quick(s, e + (xl + yl))


def _ds_mul(xh, xl, yh, yl):
    p, e = _two_prod(xh, yh)
    return _quick(p, e + (xh * yl + xl * yh))


def _polish_kernel(
    sub_hi, sub_lo, G_hi, G_lo, Dth_hi, Dth_lo,
    du_hi, du_lo, dl_hi, dl_lo, HET_hi, HET_lo,
    Uth_hi, Uth_lo, uo_hi, uo_lo, H_hi, H_lo,
    f_hi, f_lo, fth_hi, fth_lo, eq, immut,
    th_hi, th_lo, act_ref, side_ref,
    U_hi_o, U_lo_o, lam_hi_o, lam_lo_o, scal_o,
    *,
    m: int,
    n: int,
    nth: int,
    n_subsets: int,
):
    f32 = jnp.float32
    one = np.float32(1.0)
    half = np.float32(0.5)
    big = np.float32(3.0e38)
    L = lambda r: r[:, :]
    th_h, th_l = L(th_hi), L(th_lo)
    act, side = L(act_ref), L(side_ref)

    ones_sub = jnp.ones((n_subsets, 1), f32)

    # NOTE: in-kernel jnp.dot on this Mosaic stack is a single bf16 MXU
    # pass -- arbitrary-value operands lose ~8 mantissa bits. Row expansion
    # therefore uses exact sublane concatenation, and the only dots below
    # are one-hot gathers at HIGHEST precision (multi-pass bf16 is exact
    # when one side is 0/1 and each output sum has a single nonzero term).
    def expand(row_h, row_l, r):  # (1,B) ds -> (r,B) ds, exact
        return (jnp.concatenate([row_h] * r, axis=0),
                jnp.concatenate([row_l] * r, axis=0))

    def mv(Ah, Al, Xh, Xl, r):
        """Column-stacked (c*r, 1) static ds matrix times (c, B) ds
        -> (r, B) ds; unrolled compensated contraction over c."""
        c = Ah.shape[0] // r
        acc = None
        for j in range(c):
            xjh, xjl = expand(Xh[j : j + 1, :], Xl[j : j + 1, :], r)
            ph, plo = _ds_mul(Ah[j * r : (j + 1) * r, :], Al[j * r : (j + 1) * r, :], xjh, xjl)
            acc = (ph, plo) if acc is None else _ds_add(*acc, ph, plo)
        return acc

    # transformed bounds d = d0 + Dth theta
    dt_h, dt_l = mv(L(Dth_hi), L(Dth_lo), th_h, th_l, m)
    du_th, du_tl = _ds_add(L(du_hi), L(du_lo), dt_h, dt_l)
    dl_th, dl_tl = _ds_add(L(dl_hi), L(dl_lo), dt_h, dt_l)

    # rhs = -act * d_side (exact: act/side are 0/1 masks)
    ds_h = side * du_th + (one - side) * dl_th
    ds_l = side * du_tl + (one - side) * dl_tl
    rhs_h = -act * ds_h
    rhs_l = -act * ds_l

    # gather the working-set inverse by one-hot matmul (exact on the MXU)
    pow2 = jnp.exp2(jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0).astype(f32))
    mask_id = jnp.sum(act * pow2, axis=0, keepdims=True)            # (1, B)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (n_subsets, 1), 0).astype(f32)
    mask_m = jnp.dot(ones_sub, mask_id, preferred_element_type=f32,
                     precision=jax.lax.Precision.HIGHEST)
    onehot = (sub_iota == mask_m).astype(f32)                       # (2^m, B)

    # lam = inv @ rhs, unrolled over columns k; each column of the lane's
    # inverse is gathered on demand (one exact one-hot matmul per column)
    # so only (m, B) blocks are live, never the full (m*m, B) inverse
    lam = None
    for k in range(m):
        col_h = jnp.dot(sub_hi[k * m : (k + 1) * m, :], onehot, preferred_element_type=f32,
                         precision=jax.lax.Precision.HIGHEST)
        col_l = jnp.dot(sub_lo[k * m : (k + 1) * m, :], onehot, preferred_element_type=f32,
                         precision=jax.lax.Precision.HIGHEST)
        rkh, rkl = expand(rhs_h[k : k + 1, :], rhs_l[k : k + 1, :], m)
        ph, plo = _ds_mul(col_h, col_l, rkh, rkl)
        lam = (ph, plo) if lam is None else _ds_add(*lam, ph, plo)
    lam_h, lam_l = lam

    # primal recovery U = u_off + Uth theta - HinvET lam
    ut_h, ut_l = mv(L(Uth_hi), L(Uth_lo), th_h, th_l, n)
    hl_h, hl_l = mv(L(HET_hi), L(HET_lo), lam_h, lam_l, n)
    U_h, U_l = _ds_add(L(uo_hi), L(uo_lo), ut_h, ut_l)
    U_h, U_l = _ds_add(U_h, U_l, -hl_h, -hl_l)

    # objective fval = 0.5 U'(H U) + (f + f_theta theta)' U
    HU_h, HU_l = mv(L(H_hi), L(H_lo), U_h, U_l, n)
    ft_h, ft_l = mv(L(fth_hi), L(fth_lo), th_h, th_l, n)
    ft_h, ft_l = _ds_add(L(f_hi), L(f_lo), ft_h, ft_l)
    quad = None
    lin = None
    for i in range(n):
        qh, ql = _ds_mul(U_h[i : i + 1, :], U_l[i : i + 1, :],
                         HU_h[i : i + 1, :], HU_l[i : i + 1, :])
        quad = (qh, ql) if quad is None else _ds_add(*quad, qh, ql)
        lh, ll = _ds_mul(ft_h[i : i + 1, :], ft_l[i : i + 1, :],
                         U_h[i : i + 1, :], U_l[i : i + 1, :])
        lin = (lh, ll) if lin is None else _ds_add(*lin, lh, ll)
    fval_h, fval_l = _ds_add(half * quad[0], half * quad[1], *lin)

    # KKT residual: primal violation of inactive rows, multiplier sign
    # violation of removable active rows (hi parts carry the cancellation)
    c_h, c_l = mv(L(G_hi), L(G_lo), lam_h, lam_l, m)
    vup = -(_ds_add(du_th, du_tl, c_h, c_l)[0])
    vlo = _ds_add(dl_th, dl_tl, c_h, c_l)[0]
    cand = (one - act) * (one - L(immut))
    v = jnp.maximum(vup, vlo)
    v_masked = cand * v + (cand - one) * big
    primal = jnp.max(v_masked, axis=0, keepdims=True)               # (1, B)
    removable = act * (one - L(eq))
    sgn = side * (-lam_h) + (one - side) * lam_h
    s_masked = removable * sgn + (removable - one) * big
    sign_max = jnp.max(s_masked, axis=0, keepdims=True)
    bad = jnp.maximum(primal, sign_max)

    U_hi_o[:, :] = U_h
    U_lo_o[:, :] = U_l
    lam_hi_o[:, :] = lam_h
    lam_lo_o[:, :] = lam_l
    scal_o[:, :] = jnp.concatenate([fval_h, fval_l, bad], axis=0)


def polish_max_lanes(m: int, n: int, nth: int, vmem_budget_bytes: int = 13 * 2**20) -> int:
    """Largest lane chunk whose kernel working set fits VMEM.

    Structural live set per lane is ~(2^m + 2nth + 18m + 12n + 24) f32
    words (one-hot column + the ds row blocks), but Mosaic's stack
    allocation for the straight-line ds chains measures ~3.2x that
    (25.25 MB at 9472 lanes, m=5/n=5/nth=7), so a calibrated 3.5x factor
    is applied against the 16 MB hardware limit."""
    per_lane = int(3.5 * (2**m + 2 * nth + 18 * m + 12 * n + 24) * 4)
    table = 2 * (m * m) * (2**m) * 4
    lanes = (vmem_budget_bytes - table) // per_lane
    if lanes < LANES:
        # clamping up would hit Mosaic's scoped-vmem OOM at compile time
        # with an opaque error; fail with the actual configuration problem
        raise ValueError(
            f"ds polish kernel cannot fit one {LANES}-lane chunk in VMEM "
            f"(m={m}, n={n}, nth={nth}: table {table} B + "
            f"{per_lane} B/lane); disable it with LINEARMPC_TPU_DS=0"
        )
    return (lanes // LANES) * LANES


@functools.partial(jax.jit, static_argnames=("interpret",))
def polish_pallas(pd: PolishData, thetas, act, side, *, interpret: bool = False):
    """Run the fused polish tier. ``thetas`` (B, nth) float64, ``act``/
    ``side`` (B, m) bool. Returns (U, lam, fval, bad) with U/lam/fval as
    batch-major DS pairs and ``bad`` the (B,) float32 KKT residual --
    drop-in for ops/ds_polish.py::polish_batch_ds."""
    B = thetas.shape[0]
    m = pd.du_hi.shape[0]
    n = pd.uo_hi.shape[0]
    nth = pd.Dth_hi.shape[0] // m
    assert B % LANES == 0, "batch must be a multiple of 128"

    th = split_f64(thetas)
    th_hi, th_lo = th.hi.T, th.lo.T                       # (nth, B)
    act_l = jnp.asarray(act, jnp.float32).T               # (m, B)
    side_l = jnp.asarray(side, jnp.float32).T

    kernel = functools.partial(_polish_kernel, m=m, n=n, nth=nth, n_subsets=2**m)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        in_specs=[vm()] * 28,
        out_specs=[vm()] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((n, B), jnp.float32),
            jax.ShapeDtypeStruct((n, B), jnp.float32),
            jax.ShapeDtypeStruct((m, B), jnp.float32),
            jax.ShapeDtypeStruct((m, B), jnp.float32),
            jax.ShapeDtypeStruct((3, B), jnp.float32),
        ],
        interpret=interpret,
    )(*pd, th_hi, th_lo, act_l, side_l)
    U_hi, U_lo, lam_hi, lam_lo, scal = out
    U = DS(U_hi.T, U_lo.T)
    lam = DS(lam_hi.T, lam_lo.T)
    fval = DS(scal[0], scal[1])
    return U, lam, fval, scal[2]
