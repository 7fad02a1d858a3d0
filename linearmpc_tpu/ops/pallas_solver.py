"""Fused Pallas TPU kernel for the bulk dual active-set phase.

The plain XLA path dispatches ~30 small ops per solver iteration; at
m ~ 5-12 the batch spends its time in kernel-launch overhead, not compute.
Here one *entire iteration* -- working-set-inverse gather, multiplier
solve, blocking test, violation scan, state update -- is a single
gridless Pallas kernel over the whole lane-major batch resident in VMEM,
and the iteration loop is an XLA ``lax.scan`` *outside* the kernel:
28 dispatches per solve instead of ~840 (~45x on the pendulum problem).

Layout is lane-major: every per-lane vector is an (m, B) block with the
batch in the minor (lane) dimension, so
  * the working-set inverse "gather" is a one-hot matmul on the MXU,
  * the slack update G @ lam is an (m, m) @ (m, B) matmul,
  * reductions over the constraint dimension are sublane reductions.

Mosaic-lowering constraints discovered on this stack (see CLAUDE.md):
*gridded* pallas_calls and *in-kernel* lax loops fail to compile, hence
the gridless whole-batch kernel with the loop outside. Index selection
uses first-hit masks (no argmin/argmax index vectors), cumsum is a
lower-triangular matmul, scalar literals are np.float32, and (1, B) rows
are expanded through explicit ones-column matmuls.

The one-hot table is (2^m, B); the path is gated to m <= PALLAS_MAX_M so
it stays comfortably inside VMEM. Larger problems use the XLA
masked-Cholesky path. The f64 refinement phase stays in XLA (Mosaic has
no f64) and typically verifies convergence in one masked solve per lane.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
PALLAS_MAX_M = 10
# In-kernel jnp.dot defaults to ONE bf16 MXU pass on this Mosaic stack
# (~2.8e-3 relative error; integers above 256 not exactly representable).
# Every kernel dot therefore requests HIGHEST precision: the one-hot
# gathers/expansions become exact and G@lam reaches f32 accuracy.
PREC = jax.lax.Precision.HIGHEST  # one-hot table is (2^m, B_chunk); chunking bounds VMEM


def max_chunk_lanes(m: int, vmem_budget_bytes: int = 10 * 2**20) -> int:
    """Largest lane chunk whose kernel working set fits the VMEM budget:
    roughly (2^m + ~14 m) f32 per lane plus the (m*m, 2^m) table."""
    per_lane = (2**m + 14 * m) * 4
    table = (m * m) * (2**m) * 4
    lanes = (vmem_budget_bytes - table) // per_lane
    return max(LANES, (lanes // LANES) * LANES)


def _iteration_kernel(
    subset_ref,   # (m*m, 2^m) f32: subset_inv[s] flattened into column s
    G_ref,        # (m, m)
    du_ref,       # (m, B)
    dl_ref,       # (m, B)
    eq_ref,       # (m, 1) f32
    immut_ref,    # (m, 1) f32
    lam_ref, act_ref, side_ref, done_ref,   # state (m, B); done row-broadcast
    lam_o, act_o, side_o, done_o,
    *,
    m: int,
    n_subsets: int,
    B: int,
    primal_tol: float,
    sign_tol: float,
):
    f32 = jnp.float32
    du = du_ref[:, :]
    dl = dl_ref[:, :]
    G = G_ref[:, :]
    eq = eq_ref[:, :]
    immut = immut_ref[:, :]
    lam = lam_ref[:, :]
    act = act_ref[:, :]
    side = side_ref[:, :]
    done = done_ref[:, :]
    subset = subset_ref[:, :]

    big = np.float32(3.0e38)
    tiny = np.float32(1e-30)
    ptol = np.float32(primal_tol)
    stol = np.float32(sign_tol)
    half = np.float32(0.5)
    one = np.float32(1.0)
    zero = np.float32(0.0)
    pow2 = jnp.exp2(jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0).astype(f32))
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (n_subsets, B), 0).astype(f32)
    ones_col = jnp.ones((m, 1), f32)
    ones_sub = jnp.ones((n_subsets, 1), f32)

    def expand(row):  # (1, B) -> (m, B) via explicit matmul
        return jnp.dot(ones_col, row, preferred_element_type=f32, precision=PREC)

    ltri = (
        jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        >= jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    ).astype(f32)

    def first_hit(hit):
        cs = jnp.dot(ltri, hit, preferred_element_type=f32, precision=PREC)
        return hit * (cs <= 1.5).astype(f32)

    # one-hot of the active-set bitmask over the subset-inverse table
    mask_id = jnp.sum(act * pow2, axis=0, keepdims=True)            # (1, B)
    mask_m = jnp.dot(ones_sub, mask_id, preferred_element_type=f32, precision=PREC)
    onehot = (sub_iota == mask_m).astype(f32)                       # (2^m, B)
    inv_flat = jnp.dot(subset, onehot, preferred_element_type=f32, precision=PREC)  # (m*m, B)

    d_side = side * du + (one - side) * dl
    rhs = -act * d_side
    lam_star = jnp.concatenate(
        [
            jnp.sum(inv_flat[i * m : (i + 1) * m, :] * rhs, axis=0, keepdims=True)
            for i in range(m)
        ],
        axis=0,
    )

    removable = act * (one - eq)
    viol_up = (side > half) & (lam_star < -stol)
    viol_lo = (side <= half) & (lam_star > stol)
    sign_viol = (removable > half) & (viol_up | viol_lo)
    sv_f = sign_viol.astype(f32)
    hv = expand(jnp.max(sv_f, axis=0, keepdims=True))

    # blocking step: first multiplier to cross zero leaves the working set
    denom = lam - lam_star
    safe = jnp.where(jnp.abs(denom) > tiny, denom, tiny)
    alpha_i = jnp.where(sign_viol, lam / safe, big)
    alpha_min = jnp.min(alpha_i, axis=0, keepdims=True)
    is_jb = first_hit((alpha_i <= alpha_min).astype(f32))
    alpha = expand(jnp.clip(alpha_min, zero, one))
    lam_B = (lam + alpha * (lam_star - lam)) * (one - is_jb)
    act_B = act * (one - is_jb)

    # acceptance step: add the most violated inactive row
    c = jnp.dot(G, lam_star, preferred_element_type=f32, precision=PREC)
    cand = (one - act) * (one - immut)
    v_up = jnp.where(cand > half, -(du + c), -big)
    v_lo = jnp.where(cand > half, dl + c, -big)
    v = jnp.maximum(v_up, v_lo)
    vmax = jnp.max(v, axis=0, keepdims=True)
    conv = expand((vmax <= ptol).astype(f32))
    is_j = first_hit((v >= vmax).astype(f32))
    grow = is_j * (one - conv)
    act_A = jnp.maximum(act, grow)
    add_up = expand(jnp.sum(is_j * (v_up >= v_lo).astype(f32), axis=0, keepdims=True))
    side_A = side * (one - grow) + grow * add_up
    lam_A = lam_star * act_A

    new_lam = hv * lam_B + (one - hv) * lam_A
    new_act = hv * act_B + (one - hv) * act_A
    new_side = hv * side + (one - hv) * side_A
    new_done = done + (one - done) * (one - hv) * conv

    lam_o[:, :] = done * lam + (one - done) * new_lam
    act_o[:, :] = done * act + (one - done) * new_act
    side_o[:, :] = done * side + (one - done) * new_side
    done_o[:, :] = new_done


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
    """Run the fused bulk phase; returns (lam, act, side, iters, done)
    batch-major. B must be a multiple of 128 (lane width)."""
    B = du_t.shape[0]
    assert B % LANES == 0, "batch must be a multiple of 128"

    to_lane = lambda a: jnp.asarray(a, jnp.float32).T
    du_l, dl_l = to_lane(du_t), to_lane(dl_t)
    lam_l, act_l, side_l = to_lane(lam0), to_lane(act0), to_lane(side0)
    subset_flat = jnp.asarray(subset_flat, jnp.float32)
    G = jnp.asarray(G, jnp.float32)
    eq_c = jnp.asarray(eq, jnp.float32).reshape(m, 1)
    immut_c = jnp.asarray(immut, jnp.float32).reshape(m, 1)

    kernel = functools.partial(
        _iteration_kernel, m=m, n_subsets=n_subsets, B=B,
        primal_tol=primal_tol, sign_tol=sign_tol,
    )
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        in_specs=[vm()] * 10,
        out_specs=[vm()] * 4,
        out_shape=[jax.ShapeDtypeStruct((m, B), jnp.float32)] * 4,
        interpret=interpret,
    )

    done0 = jnp.zeros((m, B), jnp.float32)

    def step(carry, _):
        lam, act, side, done = carry
        prev_done = done
        lam, act, side, done = call(
            subset_flat, G, du_l, dl_l, eq_c, immut_c, lam, act, side, done
        )
        # iteration counting: a lane iterated iff it was not already done
        return (lam, act, side, done), 1.0 - prev_done[0]

    (lam, act, side, done), active_steps = jax.lax.scan(
        step, (lam_l, act_l, side_l, done0), None, length=max_iter
    )
    iters = jnp.sum(active_steps, axis=0)
    return lam.T, act.T > 0.5, side.T > 0.5, iters.astype(jnp.int32), done[0] > 0.5


@functools.partial(
    jax.jit,
    static_argnames=("m", "n_subsets", "max_iter", "primal_tol", "sign_tol", "interpret"),
)
def phase1_pallas_while(
    subset_flat, G, du_t, dl_t, eq, immut, lam0, act0, side0,
    *,
    m: int,
    n_subsets: int,
    max_iter: int,
    primal_tol: float,
    sign_tol: float,
    interpret: bool = False,
):
    """Early-exit variant of ``phase1_pallas``: the iteration kernel runs
    under a ``lax.while_loop`` that stops as soon as every lane converges.
    The right bulk phase for warm-started solves (closed-loop rollouts),
    where most steps finish in 0-3 iterations and a fixed scan budget
    would burn ~10x the kernel dispatches."""
    B = du_t.shape[0]
    assert B % LANES == 0, "batch must be a multiple of 128"

    to_lane = lambda a: jnp.asarray(a, jnp.float32).T
    du_l, dl_l = to_lane(du_t), to_lane(dl_t)
    lam_l, act_l, side_l = to_lane(lam0), to_lane(act0), to_lane(side0)
    subset_flat = jnp.asarray(subset_flat, jnp.float32)
    G = jnp.asarray(G, jnp.float32)
    eq_c = jnp.asarray(eq, jnp.float32).reshape(m, 1)
    immut_c = jnp.asarray(immut, jnp.float32).reshape(m, 1)

    kernel = functools.partial(
        _iteration_kernel, m=m, n_subsets=n_subsets, B=B,
        primal_tol=primal_tol, sign_tol=sign_tol,
    )
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        in_specs=[vm()] * 10,
        out_specs=[vm()] * 4,
        out_shape=[jax.ShapeDtypeStruct((m, B), jnp.float32)] * 4,
        interpret=interpret,
    )

    done0 = jnp.zeros((m, B), jnp.float32)
    iters0 = jnp.zeros((B,), jnp.float32)

    def cond(c):
        lam, act, side, done, iters, it = c
        return (it < max_iter) & (jnp.min(done[0]) < 0.5)

    def body(c):
        lam, act, side, done, iters, it = c
        iters = iters + (1.0 - done[0])
        lam, act, side, done = call(
            subset_flat, G, du_l, dl_l, eq_c, immut_c, lam, act, side, done
        )
        return (lam, act, side, done, iters, it + 1)

    lam, act, side, done, iters, _ = jax.lax.while_loop(
        cond, body, (lam_l, act_l, side_l, done0, iters0, jnp.int32(0))
    )
    return lam.T, act.T > 0.5, side.T > 0.5, iters.astype(jnp.int32), done[0] > 0.5
