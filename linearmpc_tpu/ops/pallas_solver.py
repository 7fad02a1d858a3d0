"""Fused Pallas TPU kernel for the bulk dual active-set phase.

The XLA path dispatches ~30 small ops per solver iteration; at m ~ 5-12
the batch spends its time in kernel-launch overhead, not compute. This
kernel fuses the entire fixed-precision solve -- working-set-inverse
gather, multiplier solve, blocking test, violation scan, and state update
-- into a single program over a tile of lanes resident in VMEM.

Layout is lane-major: every per-lane vector lives as an (m, T) block with
T = 128 lanes in the minor (lane) dimension, so
  * the working-set inverse "gather" is a one-hot matmul
    (m*m, 2^m) @ (2^m, T) on the MXU,
  * the slack update G @ lam is an (m, m) @ (m, T) matmul,
  * reductions over the constraint dimension are sublane reductions.

Only the subset-inverse (enumerated working sets, m <= 12) path is
implemented; larger problems use the XLA masked-Cholesky path. The f64
refinement phase stays in XLA (Mosaic has no f64) and typically runs a
single verification iteration per lane.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _phase1_kernel(
    # inputs (VMEM refs)
    subset_ref,   # (2^m * m, m) f32: subset_inv stacked row-blocks, transposed layout below
    G_ref,        # (m, m)
    du_ref,       # (m, T)
    dl_ref,       # (m, T)
    eq_ref,       # (m, 1) f32
    immut_ref,    # (m, 1) f32
    lam0_ref,     # (m, T)
    act0_ref,     # (m, T) f32
    side0_ref,    # (m, T) f32
    # outputs
    lam_out,      # (m, T)
    act_out,      # (m, T) f32
    side_out,     # (m, T) f32
    iters_out,    # (m, T) f32 (row-broadcast)
    done_out,     # (m, T) f32 (row-broadcast)
    *,
    m: int,
    n_subsets: int,
    max_iter: int,
    primal_tol: float,
    sign_tol: float,
):
    f32 = jnp.float32
    du = du_ref[:, :]
    dl = dl_ref[:, :]
    G = G_ref[:, :]
    eq = eq_ref[:, :]          # (m,1)
    immut = immut_ref[:, :]
    pow2 = jnp.exp2(jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0).astype(f32))
    subset = subset_ref[:, :]  # (m*m, 2^m)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (n_subsets, 1), 0).astype(f32)
    big = np.float32(3.0e38)
    tiny = np.float32(1e-30)
    ptol = np.float32(primal_tol)
    stol = np.float32(sign_tol)
    half = np.float32(0.5)
    one = np.float32(1.0)
    zero = np.float32(0.0)
    # lower-triangular ones for first-hit selection (cumsum as a matmul)
    ltri = (
        jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        >= jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    ).astype(f32)

    def first_hit(hit):
        cs = jnp.dot(ltri, hit, preferred_element_type=f32)
        return hit * (cs <= 1.5).astype(f32)

    def body(_k, state):
        lam, act, side, it, done = state
        # one-hot of the active-set bitmask -> (2^m, T)
        mask_id = jnp.sum(act * pow2, axis=0, keepdims=True)       # (1, T)
        onehot = (sub_iota == mask_id).astype(f32)                  # (2^m, T)
        inv_flat = jnp.dot(subset, onehot, preferred_element_type=f32)  # (m*m, T)

        d_side = side * du + (one - side) * dl                      # (m, T)
        rhs = -act * d_side
        # lam_star_i = sum_j inv[i, j] * rhs_j  (small static loop over i)
        lam_star = jnp.concatenate(
            [
                jnp.sum(inv_flat[i * m : (i + 1) * m, :] * rhs, axis=0, keepdims=True)
                for i in range(m)
            ],
            axis=0,
        )                                                           # (m, T)

        removable = act * (one - eq)
        viol_up = (side > half) & (lam_star < -stol)
        viol_lo = (side <= half) & (lam_star > stol)
        sign_viol = (removable > 0.5) & (viol_up | viol_lo)
        sv_f = sign_viol.astype(f32)
        has_viol = jnp.max(sv_f, axis=0, keepdims=True) > half       # (1, T)

        # blocking step (index selection via first-hit masks: Mosaic-friendly,
        # no 1-D index vectors)
        denom = lam - lam_star
        safe = jnp.where(jnp.abs(denom) > tiny, denom, tiny)
        alpha_i = jnp.where(sign_viol, lam / safe, big)
        alpha_min = jnp.min(alpha_i, axis=0, keepdims=True)         # (1, T)
        is_jb = first_hit((alpha_i <= alpha_min).astype(f32))
        alpha = jnp.clip(alpha_min, zero, one)
        lam_B = (lam + alpha * (lam_star - lam)) * (one - is_jb)
        act_B = act * (one - is_jb)

        # acceptance step: add most violated row
        c = jnp.dot(G, lam_star, preferred_element_type=f32)        # (m, T)
        cand = (one - act) * (one - immut)
        v_up = jnp.where(cand > half, -(du + c), -big)
        v_lo = jnp.where(cand > half, dl + c, -big)
        v = jnp.maximum(v_up, v_lo)
        vmax = jnp.max(v, axis=0, keepdims=True)                    # (1, T)
        converged = vmax <= ptol
        is_j = first_hit((v >= vmax).astype(f32))
        grow = is_j * (one - converged.astype(f32))
        act_A = jnp.maximum(act, grow)
        add_up = jnp.sum(is_j * (v_up >= v_lo).astype(f32), axis=0, keepdims=True)
        side_A = side * (one - grow) + grow * add_up
        lam_A = lam_star * act_A

        hv = has_viol.astype(f32)
        new_lam = hv * lam_B + (one - hv) * lam_A
        new_act = hv * act_B + (one - hv) * act_A
        new_side = hv * side + (one - hv) * side_A
        new_done = done + (one - done) * (one - hv) * converged.astype(f32)

        nd = done  # freeze lanes that were already done
        lam = nd * lam + (one - nd) * new_lam
        act = nd * act + (one - nd) * new_act
        side = nd * side + (one - nd) * new_side
        it = it + (one - done)
        return (lam, act, side, it, new_done)

    # derive the (1, T) zeros from loaded data so their layout matches the
    # loop-carried values (a splat constant is fully replicated and Mosaic
    # cannot relayout it back from the row layout produced in the body)
    zero_row = du[0:1, :] * np.float32(0.0)
    init = (
        lam0_ref[:, :],
        act0_ref[:, :],
        side0_ref[:, :],
        zero_row,
        zero_row,
    )
    # fixed trip count: Mosaic layouts dislike scalar-reduced while conds,
    # and a fused masked iteration is cheap enough to run the full budget
    lam, act, side, it, done = jax.lax.fori_loop(0, max_iter, body, init)
    lam_out[:, :] = lam
    act_out[:, :] = act
    side_out[:, :] = side
    ones_col = jnp.ones((m, 1), jnp.float32)
    iters_out[:, :] = jnp.dot(ones_col, it, preferred_element_type=jnp.float32)
    done_out[:, :] = jnp.dot(ones_col, done, preferred_element_type=jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("m", "n_subsets", "max_iter", "primal_tol", "sign_tol", "interpret"),
)
def phase1_pallas(
    subset_flat,  # (m*m, 2^m) f32
    G,            # (m, m) f32
    du_t,         # (B, m) f32 transformed upper bounds
    dl_t,         # (B, m)
    eq,           # (m,) f32
    immut,        # (m,) f32
    lam0,         # (B, m)
    act0,         # (B, m) f32
    side0,        # (B, m) f32
    *,
    m: int,
    n_subsets: int,
    max_iter: int,
    primal_tol: float,
    sign_tol: float,
    interpret: bool = False,
):
    """Run the fused bulk phase; returns (lam, act, side, iters, done) batch-major."""
    B = du_t.shape[0]
    assert B % LANES == 0, "batch must be a multiple of 128"
    grid = B // LANES

    # batch-major (B, m) -> lane-major tiles (m, B) sliced along lanes
    to_lane = lambda a: jnp.asarray(a, jnp.float32).T
    du_l, dl_l = to_lane(du_t), to_lane(dl_t)
    lam_l, act_l, side_l = to_lane(lam0), to_lane(act0), to_lane(side0)

    kernel = functools.partial(
        _phase1_kernel, m=m, n_subsets=n_subsets, max_iter=max_iter,
        primal_tol=primal_tol, sign_tol=sign_tol,
    )
    tile = lambda r: pl.BlockSpec((m, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((m, B), jnp.float32),
        jax.ShapeDtypeStruct((m, B), jnp.float32),
        jax.ShapeDtypeStruct((m, B), jnp.float32),
        jax.ShapeDtypeStruct((m, B), jnp.float32),
        jax.ShapeDtypeStruct((m, B), jnp.float32),
    ]
    out_specs = [tile(None)] * 5
    lam, act, side, iters, done = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            rep((m * m, n_subsets)),
            rep((m, m)),
            tile(None), tile(None),
            rep((m, 1)), rep((m, 1)),
            tile(None), tile(None), tile(None),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(
        jnp.asarray(subset_flat, jnp.float32),
        jnp.asarray(G, jnp.float32),
        du_l, dl_l,
        jnp.asarray(eq, jnp.float32).reshape(m, 1),
        jnp.asarray(immut, jnp.float32).reshape(m, 1),
        lam_l, act_l, side_l,
    )
    return lam.T, act.T > 0.5, side.T > 0.5, iters[0].astype(jnp.int32), done[0] > 0.5
