"""Fused Pallas TPU kernel for the large-m (m > subset cache) bulk phase.

The production small-m path (ops/pallas_solver.py) collapses each dual
active-set iteration to a one-hot gather over the 2^m subset-inverse table
-- architecturally capped at m <= 10. This kernel removes that ceiling:
it runs the Goldfarb-Idnani inverse-update iteration of
``ops.dual_active_set._active_set_loop_iu`` (pending-candidate partial
steps, dual-unbounded-ray infeasibility detection, rank-2 Woodbury updates
of the carried masked working-set inverse R) as ONE gridless kernel per
solver iteration over a lane-major batch, with the iteration loop an XLA
``lax.scan``/``while_loop`` OUTSIDE the kernel (this Mosaic stack compiles
neither gridded pallas_calls nor in-kernel loops, see CLAUDE.md).

The XLA while-loop IU path dispatches ~30 HLO ops per iteration, each
streaming the (B, m, m) carried inverse through HBM; here every iteration
reads and writes R exactly once. Per-lane m x m algebra is expressed in a
flattened (m*m, B) lane-major layout through exact one-hot matmuls
(HIGHEST precision; the movement matrices are 0/1):

  * matvec   (R @ x)[i]    = S_grp @ (R * (T_tile @ x))
  * column   R[:, ch]      = matvec(R, onehot_ch)       (R symmetric)
  * outer    (a ⊗ b)[i,j]  = (T_rep @ a) * (T_tile @ b)

with T_tile[i*m+j, j] = 1, T_rep[i*m+j, i] = 1, S_grp[i, i*m+j] = 1.

Index selection uses first-hit masks, (1, B) rows are expanded through
ones-column matmuls, and the pending GI candidate is carried as a SIGNED
one-hot row (+1 pending at upper bound, -1 at lower, all-zero none), so
the whole state stays in f32 vector registers.

VMEM bounds the lane chunk: the kernel holds R (m^2 per lane), a few
m^2-sized temporaries, and the three (m^3) movement matrices; see
``iu_max_chunk_lanes``. Reference algorithm: DAQP / Goldfarb-Idnani dual
method (Arnstrom, Bemporad, Axehill, IEEE TAC 2022), invoked by the
reference at src/utils.jl:268-283.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
PREC = jax.lax.Precision.HIGHEST  # in-kernel jnp.dot defaults to one bf16 pass


def iu_max_chunk_lanes(m: int, vmem_budget_bytes: int = 12 * 2**20) -> int:
    """Largest lane chunk whose kernel working set fits VMEM, or 0 when even
    one 128-lane chunk does not fit (the path is then disabled).

    Budget model (f32): movement matrices 3*m^3, carried R + ~6 live
    m^2-sized temporaries, and ~40 m-sized rows per lane.
    """
    consts = 3 * (m * m * m) * 4
    per_lane = (7 * m * m + 40 * m) * 4
    lanes = (vmem_budget_bytes - consts) // per_lane
    if lanes < LANES:
        return 0
    return min(512, (lanes // LANES) * LANES)


def make_iu_consts(m: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The 0/1 data-movement matrices (T_tile, T_rep, S_grp) as f32."""
    i = np.arange(m * m) // m
    j = np.arange(m * m) % m
    T_tile = np.zeros((m * m, m), np.float32)
    T_tile[np.arange(m * m), j] = 1.0
    T_rep = np.zeros((m * m, m), np.float32)
    T_rep[np.arange(m * m), i] = 1.0
    S_grp = T_rep.T.copy()  # S_grp[i, i*m+j] = 1
    return T_tile, T_rep, S_grp


def init_R_batch(G_solve, act0) -> jax.Array:
    """Masked working-set inverses for the initial active sets (B, m, m) f32.

    Mirrors the init of ``_active_set_loop_iu``: batched masked Cholesky
    inverse plus two Newton-Schulz steps at HIGHEST precision (TPU f32
    Cholesky runs its internal dots in bf16; see ops/dual_active_set.py).
    """
    from .dual_active_set import _masked_inverse

    G_solve = jnp.asarray(G_solve, jnp.float32)
    m = G_solve.shape[0]
    eps = jnp.finfo(jnp.float32).eps
    Gs = G_solve + (4.0 * eps) * jnp.eye(m, dtype=jnp.float32)

    def one(act):
        actf = act.astype(jnp.float32)
        M = Gs * actf[:, None] * actf[None, :] + jnp.diag(1.0 - actf)
        R = _masked_inverse(M)
        if jax.default_backend() != "cpu":
            eye = jnp.eye(m, dtype=jnp.float32)
            for _ in range(2):
                MR = jnp.dot(M, R, precision=jax.lax.Precision.HIGHEST)
                R = jnp.dot(R, 2.0 * eye - MR, precision=jax.lax.Precision.HIGHEST)
        return R

    return jax.vmap(one)(act0)


def _iu_iteration_kernel(
    Ttile_ref,   # (m*m, m) f32 one-hot: row i*m+j -> col j
    Trep_ref,    # (m*m, m) f32 one-hot: row i*m+j -> col i
    Sgrp_ref,    # (m, m*m) f32 one-hot: groups rows i*m+j by i
    G_ref,       # (m, m) f32 dual Gram matrix (no soft diagonal)
    softd_ref,   # (m, 1) f32 rho_soft + ridge (G_solve = G + diag(softd))
    du_ref,      # (m, B)
    dl_ref,      # (m, B)
    eq_ref,      # (m, 1) f32
    immut_ref,   # (m, 1) f32
    lam_ref, act_ref, side_ref, pend_ref, done_ref, infeas_ref,  # state (m, B)
    R_ref,       # (m*m, B) carried masked working-set inverse
    lam_o, act_o, side_o, pend_o, done_o, infeas_o, R_o,
    *,
    m: int,
    primal_tol: float,
    sign_tol: float,
    gamma_tol: float,
):
    f32 = jnp.float32
    Ttile = Ttile_ref[:, :]
    Trep = Trep_ref[:, :]
    Sgrp = Sgrp_ref[:, :]
    G = G_ref[:, :]
    softd = softd_ref[:, :]
    du = du_ref[:, :]
    dl = dl_ref[:, :]
    eq = eq_ref[:, :]
    immut = immut_ref[:, :]
    lam = lam_ref[:, :]
    act = act_ref[:, :]
    side = side_ref[:, :]
    pend = pend_ref[:, :]
    done = done_ref[:, :]
    infeas = infeas_ref[:, :]
    R = R_ref[:, :]

    big = np.float32(3.0e38)
    tiny = np.float32(1e-30)
    ptol = np.float32(primal_tol)
    stol = np.float32(sign_tol)
    gtol = np.float32(gamma_tol)
    half = np.float32(0.5)
    one = np.float32(1.0)
    zero = np.float32(0.0)
    ones_col = jnp.ones((m, 1), f32)
    ones_m2 = jnp.ones((m * m, 1), f32)

    dot = lambda A, x: jnp.dot(A, x, preferred_element_type=f32, precision=PREC)
    expand = lambda row: dot(ones_col, row)        # (1, B) -> (m, B)
    expand2 = lambda row: dot(ones_m2, row)        # (1, B) -> (m*m, B)
    rowsum = lambda a: jnp.sum(a, axis=0, keepdims=True)
    matvec = lambda x: dot(Sgrp, R * dot(Ttile, x))  # per-lane R @ x

    ltri = (
        jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        >= jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    ).astype(f32)

    def first_hit(hit):  # keep only the first True row per lane
        cs = dot(ltri, hit)
        return hit * (cs <= np.float32(1.5)).astype(f32)

    # -- working-set jump target lam_star = R @ rhs
    d_side = side * du + (one - side) * dl
    rhs = -act * d_side
    lam_star = matvec(rhs)

    pend_abs = jnp.abs(pend)
    pending = rowsum(pend_abs)                      # (1, B) in {0, 1}
    pending_e = expand(pending)

    # -- sign check (suspended while a GI add is pending)
    removable = act * (one - eq)
    viol_up = (side > half) & (lam_star < -stol)
    viol_lo = (side <= half) & (lam_star > stol)
    sign_viol = ((removable > half) & (pending_e <= half)) & (viol_up | viol_lo)
    sv_f = sign_viol.astype(f32)
    hv = expand(jnp.max(sv_f, axis=0, keepdims=True))

    # -- blocking step: first multiplier to cross zero leaves the set
    denom = lam - lam_star
    safe = jnp.where(jnp.abs(denom) > tiny, denom, tiny)
    alpha_i = jnp.where(sign_viol, lam / safe, big)
    alpha_min = jnp.min(alpha_i, axis=0, keepdims=True)
    oh_jb = first_hit((alpha_i <= alpha_min).astype(f32))
    alpha = expand(jnp.clip(alpha_min, zero, one))
    lam_B = (lam + alpha * (lam_star - lam)) * (one - oh_jb)
    act_B = act * (one - oh_jb)

    # -- working point: the jump in normal mode, the carried GI iterate
    #    (holding the pending candidate's partial multiplier) mid-add
    lam_base = pending_e * lam + (one - pending_e) * act * lam_star
    c = dot(G, lam_base)
    cand = (one - act) * (one - immut)
    v_up = jnp.where(cand > half, -(du + c), -big)
    v_lo = jnp.where(cand > half, dl + c, -big)
    v = jnp.maximum(v_up, v_lo)
    vmax = jnp.max(v, axis=0, keepdims=True)
    conv = expand(((vmax <= ptol).astype(f32)) * (one - pending))
    oh_jnew = first_hit((v >= vmax).astype(f32))

    # candidate selection: the pending row mid-add, else the most violated
    oh_jsel = pending_e * pend_abs + (one - pending_e) * oh_jnew
    side_new = rowsum(oh_jnew * (v_up >= v_lo).astype(f32))
    side_pend = (rowsum(pend) > zero).astype(f32)
    side_j = expand(pending * side_pend + (one - pending) * side_new)
    sgn_j = np.float32(2.0) * side_j - one
    viol_j = expand(rowsum(oh_jsel * jnp.where(side_j > half, -(du + c), dl + c)))
    drop_pend = pending_e * ((viol_j <= ptol).astype(f32))

    # -- GI add step for the selected candidate
    Gcol_j = dot(G, oh_jsel) + softd * oh_jsel     # G_solve[:, j_sel]
    vj = act * (one - oh_jsel) * Gcol_j
    Rvj = matvec(vj)
    gjj_sel = rowsum(oh_jsel * Gcol_j)
    gamma = expand(gjj_sel) - expand(rowsum(vj * Rvj))
    dvec = sgn_j * Rvj
    t_primal = jnp.where(
        gamma > gtol, jnp.maximum(viol_j, zero) / jnp.maximum(gamma, gtol), big
    )
    # float mask algebra: a bool-valued where (select of two i1 vectors)
    # fails Mosaic lowering ("unsupported target bitwidth for truncation")
    dir_ok = side * (dvec > zero).astype(f32) + (one - side) * (dvec < zero).astype(f32)
    valid_f = act * (one - eq) * dir_ok
    t_cand = jnp.maximum(lam_base / jnp.where(dvec == zero, one, dvec), zero)
    t_i = jnp.where(valid_f > half, t_cand, big)
    t_min = jnp.min(t_i, axis=0, keepdims=True)
    oh_ib = first_hit((t_i <= t_min).astype(f32))
    t_dual = expand(t_min)
    full_add = (t_primal <= t_dual).astype(f32)
    t_step = jnp.minimum(t_primal, t_dual)
    no_step = (t_step >= big).astype(f32)
    live = (one - hv) * (one - conv) * (one - drop_pend)
    infeas_now = live * no_step * (one - done)
    ts = live * (one - no_step)

    lam_G = lam_base - act * t_step * dvec
    lam_G = (one - oh_jsel) * lam_G + oh_jsel * (lam_base + sgn_j * t_step)
    lam_G = jnp.where((oh_ib > half) & (full_add <= half), zero, lam_G)
    act_G = full_add * jnp.maximum(act, oh_jsel) + (one - full_add) * act * (one - oh_ib)
    side_G = side * (one - full_add * oh_jsel) + full_add * oh_jsel * side_j
    lam_DP = lam_base * (one - oh_jsel)

    new_lam = hv * lam_B + (one - hv) * (
        ts * lam_G + (one - ts) * (drop_pend * lam_DP + (one - drop_pend) * lam_base)
    )
    new_act = hv * act_B + (one - hv) * (ts * act_G + (one - ts) * act)
    new_side = (hv + (one - hv) * (one - ts)) * side + (one - hv) * ts * side_G
    # pending candidate: kept through a partial (dual-blocked) step, cleared
    # by a full add or a resolved violation; signed one-hot encodes the side
    pend_G = ts * (one - full_add) * oh_jsel * sgn_j
    keep = (one - ts) * (one - drop_pend)
    new_pend = (one - hv) * (pend_G + keep * pend) + hv * pend
    new_done = done + (one - done) * jnp.maximum((one - hv) * conv, infeas_now)

    # -- rank-2 Woodbury update of R for the single changed row
    is_rem = jnp.maximum(hv, ts * (one - full_add))
    oh_ch = hv * oh_jb + (one - hv) * (full_add * oh_jsel + (one - full_add) * oh_ib)
    Gcol_ch = dot(G, oh_ch) + softd * oh_ch
    vcol = new_act * (one - oh_ch) * Gcol_ch
    Re = matvec(oh_ch)
    Rv = matvec(vcol)
    gjj = expand(rowsum(oh_ch * Gcol_ch))
    a11 = expand(rowsum(oh_ch * Re))
    a12 = expand(rowsum(oh_ch * Rv))
    a21 = expand(rowsum(vcol * Re))
    a22 = expand(rowsum(vcol * Rv))
    S00 = jnp.where(is_rem > half, -a11, a11)
    S01 = jnp.where(is_rem > half, one - a12, one + a12)
    S10 = jnp.where(is_rem > half, one - a21, one + a21)
    S11 = jnp.where(is_rem > half, (one - gjj) - a22, (one - gjj) + a22)
    det = S00 * S11 - S01 * S10
    det = jnp.where(jnp.abs(det) > tiny, det, tiny)
    t0 = (S11 * Re - S10 * Rv) / det
    t1 = (-S01 * Re + S00 * Rv) / det
    upd = dot(Trep, t0) * dot(Ttile, Re) + dot(Trep, t1) * dot(Ttile, Rv)
    changed = (jnp.maximum(hv, ts) * (one - done))[0:1, :]
    # add subtracts the correction, remove adds it; where-selects (not
    # arithmetic gating) so an unselected pathological update (det ~ 0 ->
    # inf entries) cannot poison R through 0 * inf = NaN
    upd_signed = jnp.where(expand2(is_rem[0:1, :]) > half, upd, -upd)
    R_o[:, :] = jnp.where(expand2(changed) > half, R + upd_signed, R)

    gate = lambda new, old: done * old + (one - done) * new
    lam_o[:, :] = gate(new_lam, lam)
    act_o[:, :] = gate(new_act, act)
    side_o[:, :] = gate(new_side, side)
    pend_o[:, :] = gate(new_pend, pend)
    done_o[:, :] = new_done
    infeas_o[:, :] = jnp.maximum(infeas, infeas_now)


def _build_call(m, B, primal_tol, sign_tol, gamma_tol, interpret):
    kernel = functools.partial(
        _iu_iteration_kernel, m=m,
        primal_tol=primal_tol, sign_tol=sign_tol, gamma_tol=gamma_tol,
    )
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((m, B), jnp.float32)] * 6 + [
        jax.ShapeDtypeStruct((m * m, B), jnp.float32)
    ]
    return pl.pallas_call(
        kernel,
        in_specs=[vm()] * 16,
        out_specs=[vm()] * 7,
        out_shape=out_shape,
        # the default 16M scoped-vmem limit leaves no headroom when the
        # kernel sits inside a larger program (the rollout scan missed it
        # by 112K at m=48, chunk 128); the physical budget is larger
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )


def _prep(G, softd, du_t, dl_t, eq, immut, lam0, act0, side0, R0, m):
    to_lane = lambda a: jnp.asarray(a, jnp.float32).T
    consts = make_iu_consts(m)
    Ttile, Trep, Sgrp = (jnp.asarray(a) for a in consts)
    G = jnp.asarray(G, jnp.float32)
    softd = jnp.asarray(softd, jnp.float32).reshape(m, 1)
    # eq may be shared (m,) or per-lane (B, m) -- branch-and-bound nodes
    # clamp their fixed binary rows to equality per lane; the kernel
    # broadcasts (m, 1) and (m, B) identically
    eq = jnp.asarray(eq, jnp.float32)
    eq_c = eq.reshape(m, 1) if eq.ndim == 1 else to_lane(eq)
    immut_c = jnp.asarray(immut, jnp.float32).reshape(m, 1)
    du_l, dl_l = to_lane(du_t), to_lane(dl_t)
    lam_l = to_lane(lam0) * to_lane(act0)
    act_l, side_l = to_lane(act0), to_lane(side0)
    B = du_l.shape[1]
    R_l = jnp.asarray(R0, jnp.float32).reshape(B, m * m).T
    return (Ttile, Trep, Sgrp, G, softd, du_l, dl_l, eq_c, immut_c,
            lam_l, act_l, side_l, R_l)


@functools.partial(
    jax.jit,
    static_argnames=("m", "max_iter", "primal_tol", "sign_tol", "gamma_tol", "interpret"),
)
def phase1_iu_pallas(
    G,        # (m, m) f32 dual Gram matrix (no soft diagonal)
    softd,    # (m,) f32 rho_soft + ridge
    du_t,     # (B, m) transformed upper bounds
    dl_t,     # (B, m)
    eq,       # (m,) f32
    immut,    # (m,) f32
    lam0,     # (B, m)
    act0,     # (B, m) f32
    side0,    # (B, m) f32
    R0,       # (B, m, m) f32 masked inverse of the initial working set
    *,
    m: int,
    max_iter: int,
    primal_tol: float,
    sign_tol: float,
    gamma_tol: float = 3.5e-4,
    interpret: bool = False,
):
    """Fixed-budget scan over the fused GI iteration kernel. Returns
    (lam, act, side, iters, done, infeas, R) batch-major."""
    B = du_t.shape[0]
    assert B % LANES == 0, "batch must be a multiple of 128"
    (Ttile, Trep, Sgrp, Gd, softd_c, du_l, dl_l, eq_c, immut_c,
     lam_l, act_l, side_l, R_l) = _prep(
        G, softd, du_t, dl_t, eq, immut, lam0, act0, side0, R0, m)
    call = _build_call(m, B, primal_tol, sign_tol, gamma_tol, interpret)

    zero_state = jnp.zeros((m, B), jnp.float32)

    def step(carry, _):
        lam, act, side, pend, done, infeas, R = carry
        prev_done = done
        out = call(Ttile, Trep, Sgrp, Gd, softd_c, du_l, dl_l, eq_c, immut_c,
                   lam, act, side, pend, done, infeas, R)
        return tuple(out), 1.0 - prev_done[0]

    init = (lam_l, act_l, side_l, zero_state, zero_state, zero_state, R_l)
    (lam, act, side, _pend, done, infeas, R), active_steps = jax.lax.scan(
        step, init, None, length=max_iter
    )
    iters = jnp.sum(active_steps, axis=0).astype(jnp.int32)
    return (lam.T, act.T > 0.5, side.T > 0.5, iters, done[0] > 0.5,
            infeas[0] > 0.5, R.T.reshape(B, m, m))


def make_iu_stepper(G, softd, immut, *, m, K, chunk,
                    primal_tol, sign_tol, gamma_tol=3.5e-4, interpret=False):
    """Fixed-K iteration stepper over LANE-MAJOR solver state, for callers
    that own the outer loop (the incremental frontier B&B keeps the GI
    state alive across branch-and-bound rounds so every kernel iteration
    is productive for every lane -- no lockstep max-iteration sync).

    Returns ``step(du_l, dl_l, eq_l, state) -> (state, active_steps)``
    where ``state = (lam, act, side, pend, done, infeas, R)`` with the
    first six ``(m, B)`` f32 and ``R`` ``(m*m, B)`` f32, ``du_l/dl_l/eq_l``
    ``(m, B)``, and ``active_steps`` the per-lane count of non-frozen
    iterations this call. ``B`` must be a multiple of ``chunk`` (or equal
    to it); chunks run under ``lax.map``.
    """
    Ttile, Trep, Sgrp = (jnp.asarray(a) for a in make_iu_consts(m))
    G32 = jnp.asarray(G, jnp.float32)
    softd_c = jnp.asarray(softd, jnp.float32).reshape(m, 1)
    immut_c = jnp.asarray(immut, jnp.float32).reshape(m, 1)

    def step(du_l, dl_l, eq_l, state):
        B = du_l.shape[1]
        # callers must pre-pad: B < 128 would give CH = 0 below and trace
        # a zero-lane kernel (ADVICE r3 #3)
        assert B % LANES == 0, (
            f"stepper batch must be a multiple of {LANES} lanes, got {B}")
        # largest 128-multiple chunk that DIVIDES B (a batch of e.g. 640
        # lanes with chunk 512 must fall back to 128-lane chunks, not
        # trip the divisibility assert below)
        CH = min(chunk, B)
        CH -= CH % LANES
        while CH > LANES and B % CH:
            CH -= LANES
        call = _build_call(m, CH, primal_tol, sign_tol, gamma_tol, interpret)

        def k_iters(du_c, dl_c, eq_c, st):
            def body(carry, _):
                prev = carry[4][0]  # done row
                out = call(Ttile, Trep, Sgrp, G32, softd_c, du_c, dl_c,
                           eq_c, immut_c, *carry)
                return tuple(out), 1.0 - prev
            st, steps = jax.lax.scan(body, st, None, length=K)
            return st, jnp.sum(steps, axis=0)

        if CH == B:
            return k_iters(du_l, dl_l, eq_l, state)
        assert B % CH == 0, "batch must be a multiple of the lane chunk"
        nc = B // CH
        resh = lambda a: a.reshape(a.shape[0], nc, CH).transpose(1, 0, 2)
        args = tuple(resh(a) for a in (du_l, dl_l, eq_l) + tuple(state))

        def one(a):
            st, steps = k_iters(a[0], a[1], a[2], tuple(a[3:]))
            return st + (steps,)

        outs = jax.lax.map(one, args)
        unresh = lambda a: a.transpose(1, 0, 2).reshape(a.shape[1], nc * CH)
        return tuple(unresh(o) for o in outs[:7]), outs[7].reshape(nc * CH)

    return step


@functools.partial(
    jax.jit,
    static_argnames=("m", "max_iter", "primal_tol", "sign_tol", "gamma_tol",
                     "interpret", "retry_infeas"),
)
def phase1_iu_pallas_while(
    G, softd, du_t, dl_t, eq, immut, lam0, act0, side0, R0,
    *,
    m: int,
    max_iter: int,
    primal_tol: float,
    sign_tol: float,
    gamma_tol: float = 3.5e-4,
    interpret: bool = False,
    retry_infeas: bool = True,
):
    """Early-exit variant: stops as soon as every lane converges (the right
    bulk phase for warm-started closed-loop rollouts).

    ``retry_infeas``: a dual-unbounded-ray verdict reached from a WARM
    carried state is not trusted -- the carried inverse R drifts over
    hundreds of warm-started steps and a drifted gamma can fabricate a
    ray on a feasible instance (observed: 37% false -3 rates in the
    500-step large-m rollout bench). Flagged lanes are reset to a cold
    start (empty working set, exact identity inverse) and re-run; only a
    ray found from cold stands. Costs one extra while_loop that exits
    after a single cond evaluation when nothing was flagged. Pass False
    when the entry state is already a trustworthy cold start."""
    B = du_t.shape[0]
    assert B % LANES == 0, "batch must be a multiple of 128"
    (Ttile, Trep, Sgrp, Gd, softd_c, du_l, dl_l, eq_c, immut_c,
     lam_l, act_l, side_l, R_l) = _prep(
        G, softd, du_t, dl_t, eq, immut, lam0, act0, side0, R0, m)
    call = _build_call(m, B, primal_tol, sign_tol, gamma_tol, interpret)

    zero_state = jnp.zeros((m, B), jnp.float32)
    iters0 = jnp.zeros((B,), jnp.float32)

    def cond(c):
        *_state, done, _infeas, _R, _iters, it = c
        return (it < max_iter) & (jnp.min(done[0]) < 0.5)

    def body(c):
        lam, act, side, pend, done, infeas, R, iters, it = c
        iters = iters + (1.0 - done[0])
        lam, act, side, pend, done, infeas, R = call(
            Ttile, Trep, Sgrp, Gd, softd_c, du_l, dl_l, eq_c, immut_c,
            lam, act, side, pend, done, infeas, R)
        return (lam, act, side, pend, done, infeas, R, iters, it + 1)

    lam, act, side, pend, done, infeas, R, iters, _ = jax.lax.while_loop(
        cond, body,
        (lam_l, act_l, side_l, zero_state, zero_state, zero_state, R_l,
         iters0, jnp.int32(0)),
    )
    if retry_infeas:
        flag = infeas[0:1]                      # (1, B) in {0, 1}
        keep = 1.0 - flag
        eye_flat = jnp.asarray(np.eye(m, dtype=np.float32).reshape(m * m, 1))
        lam = lam * keep
        act = act * keep                        # empty set is a valid cold
        side = side * keep + flag               # start even with eq rows
        pend = pend * keep
        done = done * keep
        infeas = infeas * keep
        R = R * keep + eye_flat * flag
        lam, act, side, _pend, done, infeas, R, iters, _ = jax.lax.while_loop(
            cond, body,
            (lam, act, side, pend, done, infeas, R, iters, jnp.int32(0)),
        )
    return (lam.T, act.T > 0.5, side.T > 0.5, iters.astype(jnp.int32),
            done[0] > 0.5, infeas[0] > 0.5, R.T.reshape(B, m, m))
