"""Double-single (compensated float32) arithmetic for the solution polish.

TPU float64 is software-emulated and slow; the reference's all-double DAQP
arithmetic (SURVEY.md N1) cannot be translated directly without paying that
emulation cost on every finishing step. Instead, a value is carried as an
unevaluated sum ``hi + lo`` of two float32s ("double-single"), which gives
~49 effective mantissa bits through error-free transformations (Dekker 1971;
Knuth TAOCP vol. 2). Every operation below is a handful of *native* float32
adds/muls, so the polish runs at full VPU rate and fuses in XLA -- this is
what lets the Pallas bulk phase finish without the emulated-f64 tier that
used to dominate the batch time.

Two constraints shape the implementation:

* No FMA is exposed through ``lax``, so ``two_prod`` uses Veltkamp
  splitting (exact factorization of a float32 into 12+12 mantissa bits).
* All contractions are Python-unrolled elementwise chains (never
  ``jnp.dot``): TPU matmuls route through the MXU which truncates f32
  inputs, destroying the error terms the representation relies on.

Accuracy: with inputs split exactly from float64, a length-k compensated
contraction keeps relative error O(k * 2^-48) -- for the m <= 10 working
sets here that is ~1e-13, comfortably inside the framework's 1e-9
solution contract (verified to ~1e-12 against the NumPy f64 reference in
tests/test_ds.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

F32 = jnp.float32
_SPLITTER = np.float32(4097.0)  # 2^12 + 1 (Veltkamp constant for f32)


class DS(NamedTuple):
    """A tensor of double-single numbers: value = hi + lo (elementwise)."""

    hi: jnp.ndarray
    lo: jnp.ndarray

    def to_f64(self) -> jnp.ndarray:
        return self.hi.astype(jnp.float64) + self.lo.astype(jnp.float64)

    def to_f32(self) -> jnp.ndarray:
        return self.hi


def ds_zeros_like(x) -> DS:
    z = jnp.zeros_like(x, dtype=F32)
    return DS(z, z)


def split_f64(x) -> DS:
    """Exact split of a float64 array into a double-single pair.

    Works on device (one f64 subtract) or on host NumPy data.
    """
    if isinstance(x, np.ndarray) or np.isscalar(x):
        x = np.asarray(x, dtype=np.float64)
        hi = x.astype(np.float32)
        lo = (x - hi.astype(np.float64)).astype(np.float32)
        return DS(jnp.asarray(hi), jnp.asarray(lo))
    x = x.astype(jnp.float64)
    hi = x.astype(F32)
    lo = (x - hi.astype(jnp.float64)).astype(F32)
    return DS(hi, lo)


def split_f64_np(x) -> tuple[np.ndarray, np.ndarray]:
    """Host-side split returning NumPy float32 pairs (for static tables)."""
    x = np.asarray(x, dtype=np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


# -- error-free transformations (all native f32) -----------------------------

def two_sum(a, b):
    """s + e == a + b exactly (Knuth)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """s + e == a + b exactly, assuming |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def veltkamp_split(a):
    """a == h + l exactly with h carrying the top 12 mantissa bits."""
    t = _SPLITTER * a
    h = t - (t - a)
    return h, a - h


def two_prod(a, b):
    """p + e == a * b exactly (Dekker two-product via Veltkamp splits)."""
    p = a * b
    ah, al = veltkamp_split(a)
    bh, bl = veltkamp_split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# -- double-single operations -------------------------------------------------

def ds_add(x: DS, y: DS) -> DS:
    s, e = two_sum(x.hi, y.hi)
    e = e + (x.lo + y.lo)
    return DS(*quick_two_sum(s, e))


def ds_neg(x: DS) -> DS:
    return DS(-x.hi, -x.lo)


def ds_sub(x: DS, y: DS) -> DS:
    return ds_add(x, ds_neg(y))


def ds_mul(x: DS, y: DS) -> DS:
    p, e = two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    return DS(*quick_two_sum(p, e))


def ds_select(mask, x: DS, y: DS) -> DS:
    return DS(jnp.where(mask, x.hi, y.hi), jnp.where(mask, x.lo, y.lo))


def ds_index(x: DS, idx) -> DS:
    return DS(x.hi[idx], x.lo[idx])


# -- compensated contractions (Python-unrolled; never jnp.dot) ----------------

def ds_matvec(A: DS, x: DS) -> DS:
    """(m, k) double-single matrix times (..., k) double-single vectors
    -> (..., m). Unrolled over k; all elementwise, fuses on the VPU."""
    k = A.hi.shape[1]
    xs = lambda j: DS(x.hi[..., j, None], x.lo[..., j, None])
    As = lambda j: DS(A.hi[:, j], A.lo[:, j])
    acc = ds_mul(As(0), xs(0))
    for j in range(1, k):
        acc = ds_add(acc, ds_mul(As(j), xs(j)))
    return acc


def ds_bmatvec(A: DS, x: DS) -> DS:
    """Batched (..., m, k) double-single matrices times (..., k) vectors
    -> (..., m)."""
    k = A.hi.shape[-1]
    xs = lambda j: DS(x.hi[..., j, None], x.lo[..., j, None])
    As = lambda j: DS(A.hi[..., :, j], A.lo[..., :, j])
    acc = ds_mul(As(0), xs(0))
    for j in range(1, k):
        acc = ds_add(acc, ds_mul(As(j), xs(j)))
    return acc


def ds_dot(x: DS, y: DS) -> DS:
    """Compensated inner product over the last axis -> (...,)."""
    k = x.hi.shape[-1]
    el = lambda z, j: DS(z.hi[..., j], z.lo[..., j])
    acc = ds_mul(el(x, 0), el(y, 0))
    for j in range(1, k):
        acc = ds_add(acc, ds_mul(el(x, j), el(y, j)))
    return acc
