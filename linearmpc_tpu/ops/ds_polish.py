"""Double-single (compensated f32) finishing tier for the Pallas bulk phase.

Replaces the emulated-float64 "tier 1" polish that used to dominate batch
time on TPU (~30 f64 dispatches per batch): given each lane's final working
set from the f32 bulk phase, re-solve the working-set KKT system, recover
the primal, and compute the f64-grade KKT residual -- all in double-single
arithmetic (ops/ds.py), i.e. native f32 only.

This is the TPU-native analog of DAQP's all-double solution polish
(reference src/utils.jl:282 -> libdaqp ldp2qp_solution): same math as
ops/dual_active_set.py::polish_solution, carried to ~2^-48 relative
precision. Lanes whose residual stays above threshold (marginal f32
working sets) are still routed through the exact float64 continuation by
the engine.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .ds import (
    DS,
    ds_add,
    ds_bmatvec,
    ds_dot,
    ds_index,
    ds_matvec,
    ds_mul,
    ds_neg,
    ds_select,
    split_f64,
    split_f64_np,
)
from .ldp import LDPData


class DSLDP(NamedTuple):
    """Static solver arrays pre-split into double-single pairs (host-side)."""

    subset_inv: DS  # (2^m, m, m)
    G: DS           # (m, m)
    Dth: DS         # (m, nth)
    du: DS          # (m,)
    dl: DS          # (m,)
    HinvET: DS      # (n, m)
    Uth_off: DS     # (n, nth)
    u_off: DS       # (n,)
    H: DS           # (n, n)
    f: DS           # (n,)
    f_theta: DS     # (n, nth)
    is_eq: jnp.ndarray
    is_immutable: jnp.ndarray


def make_dsldp(ldp: LDPData, subset_inv: np.ndarray) -> DSLDP:
    ds = lambda a: DS(*map(jnp.asarray, split_f64_np(a)))
    return DSLDP(
        subset_inv=ds(subset_inv),
        G=ds(ldp.G), Dth=ds(ldp.Dth), du=ds(ldp.du), dl=ds(ldp.dl),
        HinvET=ds(ldp.HinvET), Uth_off=ds(ldp.Uth_off), u_off=ds(ldp.u_off),
        H=ds(ldp.H), f=ds(ldp.f), f_theta=ds(ldp.f_theta),
        is_eq=jnp.asarray(ldp.is_eq), is_immutable=jnp.asarray(ldp.is_immutable),
    )


def polish_batch_ds(dsl: DSLDP, thetas, act, side):
    """Polish a whole batch from its final working sets.

    Args: thetas (B, nth) float64; act/side (B, m) bool.
    Returns (U, lam, fval, bad): U/lam/fval as DS batches, ``bad`` the (B,)
    float32 KKT residual (primal violation of inactive rows + multiplier
    sign violation of active rows) used to route stragglers.
    """
    m = dsl.G.hi.shape[0]
    theta = split_f64(thetas)

    # transformed bounds d = d0 + Dth @ theta
    du_t = ds_add(dsl.du, ds_matvec(dsl.Dth, theta))
    dl_t = ds_add(dsl.dl, ds_matvec(dsl.Dth, theta))

    # working-set KKT solve via the gathered precomputed inverse
    actf = act.astype(jnp.float32)
    d_side = ds_select(side, du_t, dl_t)
    rhs = DS(-actf * d_side.hi, -actf * d_side.lo)
    pow2 = jnp.asarray(2 ** np.arange(m), dtype=jnp.int32)
    mask_id = jnp.sum(jnp.where(act, pow2, 0), axis=-1)
    inv = ds_index(dsl.subset_inv, mask_id)       # (B, m, m)
    lam = ds_bmatvec(inv, rhs)                    # (B, m)

    # primal recovery U = u_off + Uth_off theta - HinvET lam
    U = ds_add(
        ds_add(dsl.u_off, ds_matvec(dsl.Uth_off, theta)),
        ds_neg(ds_matvec(dsl.HinvET, lam)),
    )

    # objective value
    f_t = ds_add(dsl.f, ds_matvec(dsl.f_theta, theta))
    HU = ds_matvec(dsl.H, U)
    half = DS(np.float32(0.5), np.float32(0.0))
    fval = ds_add(ds_mul(half, ds_dot(U, HU)), ds_dot(f_t, U))

    # KKT residual (the hi parts carry the post-cancellation values)
    c = ds_matvec(dsl.G, lam)
    neg_inf = np.float32(-np.inf)
    inactive = ~act & ~dsl.is_immutable
    v_up = jnp.where(inactive, ds_neg(ds_add(du_t, c)).hi, neg_inf)
    v_lo = jnp.where(inactive, ds_add(dl_t, c).hi, neg_inf)
    primal = jnp.max(jnp.maximum(v_up, v_lo), axis=-1)
    sign = jnp.max(
        jnp.where(act & ~dsl.is_eq, jnp.where(side, -lam.hi, lam.hi), neg_inf),
        axis=-1,
    )
    bad = jnp.maximum(primal, sign)
    return U, lam, fval, bad
