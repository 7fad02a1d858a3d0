"""Fused Pallas TPU kernel for the COMPACT working-set bulk phase.

The full inverse-update kernel (ops/pallas_iu.py) carries the whole
(m, m) masked inverse per lane, capping the Pallas path near m = 64
(VMEM). This kernel is the lockstep analog of DAQP's recursive LDL' of
the ACTIVE rows only (Arnstrom, Bemporad, Axehill, IEEE TAC 2022;
reference README.md:70-82): each lane carries

  * ``Rw``  (s, s)   -- compact inverse over ``s_max`` working-set SLOTS
                        (identity rows on unoccupied slots), and
  * ``SEL`` (s*m,)   -- the slot-row assignment as a per-lane 0/1 matrix,
                        SEL[k*m + i] = 1 iff slot k holds constraint row i,

so memory and per-iteration work drop from O(m^2) to O(s*m) per lane and
the VMEM ceiling moves from m ~ 64 to m ~ 192+. The iteration is the
same Goldfarb-Idnani scheme as ``ops/compact_iu._active_set_loop_ciu``
(pending partial-step candidates, dual-ray infeasibility, rank-2
Woodbury updates, capacity-overflow detection), expressed in the
movement-matrix style of pallas_iu (this Mosaic stack compiles only
gridless kernels with no in-kernel loops; see CLAUDE.md):

  gather   x_w = S_slot @ (SEL * tile(x))              row -> slot space
  scatter  y   = blocksum(SEL * (T_rep_sm  @ y_w))     slot -> row space
  matvec   Rw @ x_w = S_grp_ss @ (Rw * (T_tile_ss @ x_w))
  occupancy occ = S_slot @ SEL

where ``tile(x)`` replicates the (m, B) row block s times by SUBLANE
CONCATENATION and ``blocksum(z)`` sums the s static (m, B) slices of a
(s*m, B) block -- both pure data movement, replacing what would
otherwise be the two dominant (s*m, m) @ (m, B) movement matmuls
(s*m^2*B MACs each and 2*s*m^2 floats of VMEM constants; eliminating
them cuts per-iteration FLOPs ~4x at m=256 and moves the VMEM ceiling
from m ~ 272 toward m ~ 448). All selection uses first-hit masks; every
(1, B) row expands through ones-column matmuls at HIGHEST precision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
PREC = jax.lax.Precision.HIGHEST


def ciu_max_chunk_lanes(m: int, s: int, vmem_budget_bytes: int = 36 * 2**20,
                        max_lanes: int = LANES) -> int:
    """Largest lane chunk whose kernel working set fits VMEM (0 = disabled).

    Budget model (f32): shared movement matrices 2*s^2*m + 3*s^3 + m^2
    (the s*m^2-sized tiling/grouping matrices are gone -- tile/blocksum
    are free data movement); per lane SEL + ~3 live (s*m) temporaries,
    Rw + update (2 s^2), and ~28 m-sized + ~12 s-sized rows. Mosaic's
    measured stack allocation is ~2.6x this estimate (pre-optimization
    m=256/s=24/128 lanes: model 30M, actual 79M under the kernel's 100M
    scoped limit), so the 36M default budget corresponds to ~94M real.
    The ceiling is near m ~ 448 at s = 24; chunks are capped at 128
    lanes (the only size exercised on hardware)."""
    consts = (2 * s * s * m + 3 * s**3 + m * m) * 4
    per_lane = (4 * s * m + 3 * s * s + 28 * m + 12 * s) * 4
    lanes = (vmem_budget_bytes - consts) // per_lane
    if lanes < LANES:
        return 0
    return min(max_lanes, (lanes // LANES) * LANES)


def make_ciu_consts(m: int, s: int):
    """0/1 data-movement matrices for slot<->row space (f32). Row<->slot
    tiling/grouping over the m axis is pure data movement (sublane concat
    / static-slice sums) and needs no matrices."""
    k = np.arange(s * m) // m
    Tsm_rep = np.zeros((s * m, s), np.float32)
    Tsm_rep[np.arange(s * m), k] = 1.0
    S_slot = Tsm_rep.T.copy()      # (s, s*m): groups k*m+i by k
    a = np.arange(s * s) // s
    b = np.arange(s * s) % s
    Tss_tile = np.zeros((s * s, s), np.float32)
    Tss_tile[np.arange(s * s), b] = 1.0
    Tss_rep = np.zeros((s * s, s), np.float32)
    Tss_rep[np.arange(s * s), a] = 1.0
    S_grp_ss = Tss_rep.T.copy()    # (s, s*s)
    return Tsm_rep, S_slot, Tss_tile, Tss_rep, S_grp_ss


def init_compact_batch(G_solve, act0, s_max: int):
    """Batched compact-carry init: (Rw (B,s,s), SEL (B,s*m), ovf (B,)).

    Mirrors ``compact_iu.init_compact`` (active rows packed into the
    first slots, masked inverse + Newton-Schulz) and additionally builds
    the one-hot SEL assignment the kernel carries.
    """
    from .compact_iu import init_compact

    G_solve = jnp.asarray(G_solve, jnp.float32)
    m = G_solve.shape[0]
    eps = jnp.finfo(jnp.float32).eps
    Gs = G_solve + (4.0 * eps) * jnp.eye(m, dtype=jnp.float32)

    def one(act):
        cc = init_compact(Gs, act, s_max)
        sel = (jnp.arange(m)[None, :] == cc.slots[:, None]) & cc.occ[:, None]
        ovf = jnp.sum(act) > s_max
        return cc.Rw, sel.astype(jnp.float32).reshape(s_max * m), ovf

    return jax.vmap(one)(act0)


def _ciu_iteration_kernel(
    Tsm_rep_ref,   # (s*m, s)
    S_slot_ref,    # (s, s*m)
    Tss_tile_ref,  # (s*s, s)
    Tss_rep_ref,   # (s*s, s)
    S_grp_ss_ref,  # (s, s*s)
    G_ref,         # (m, m)
    softd_ref,     # (m, 1)
    du_ref, dl_ref,            # (m, B)
    eq_ref,        # (m, 1) or (m, B)
    immut_ref,     # (m, 1)
    lam_ref, act_ref, side_ref, pend_ref, done_ref, infeas_ref, ovf_ref,  # (m, B)
    SEL_ref,       # (s*m, B)
    Rw_ref,        # (s*s, B)
    lam_o, act_o, side_o, pend_o, done_o, infeas_o, ovf_o, SEL_o, Rw_o,
    *,
    m: int,
    s: int,
    primal_tol: float,
    sign_tol: float,
    gamma_tol: float,
):
    f32 = jnp.float32
    Tsm_rep = Tsm_rep_ref[:, :]
    S_slot = S_slot_ref[:, :]
    Tss_tile = Tss_tile_ref[:, :]
    Tss_rep = Tss_rep_ref[:, :]
    S_grp_ss = S_grp_ss_ref[:, :]
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
    ovf = ovf_ref[:, :]
    SEL = SEL_ref[:, :]
    Rw = Rw_ref[:, :]

    big = np.float32(3.0e38)
    tiny = np.float32(1e-30)
    ptol = np.float32(primal_tol)
    stol = np.float32(sign_tol)
    gtol = np.float32(gamma_tol)
    half = np.float32(0.5)
    one = np.float32(1.0)
    zero = np.float32(0.0)
    ones_m = jnp.ones((m, 1), f32)
    ones_s = jnp.ones((s, 1), f32)
    ones_sm = jnp.ones((s * m, 1), f32)
    ones_ss = jnp.ones((s * s, 1), f32)

    dot = lambda A, x: jnp.dot(A, x, preferred_element_type=f32, precision=PREC)
    exp_m = lambda row: dot(ones_m, row)       # (1, B) -> (m, B)
    exp_s = lambda row: dot(ones_s, row)       # (1, B) -> (s, B)
    rowsum = lambda a: jnp.sum(a, axis=0, keepdims=True)
    # row<->slot movement over the m axis is free data movement:
    tile = lambda x: jnp.concatenate([x] * s, axis=0)     # (m,B)->(s*m,B)

    def blocksum(z):                                      # (s*m,B)->(m,B)
        acc = z[0:m, :]
        for kk in range(1, s):
            acc = acc + z[kk * m:(kk + 1) * m, :]
        return acc

    gth = lambda x: dot(S_slot, SEL * tile(x))            # row -> slot
    mvw = lambda xw: dot(S_grp_ss, Rw * dot(Tss_tile, xw))  # Rw @ xw

    ltri_m = (
        jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        >= jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    ).astype(f32)
    ltri_s = (
        jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        >= jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    ).astype(f32)

    def first_hit_m(hit):
        cs = dot(ltri_m, hit)
        return hit * (cs <= np.float32(1.5)).astype(f32)

    def first_hit_s(hit):
        cs = dot(ltri_s, hit)
        return hit * (cs <= np.float32(1.5)).astype(f32)

    occ = dot(S_slot, SEL)                     # (s, B)

    # -- working-set jump target lam_star = Rw @ rhs_w scattered to rows
    d_side = side * du + (one - side) * dl
    rhs = -act * d_side
    lam_star_w = mvw(gth(rhs))
    lam_star = blocksum(SEL * dot(Tsm_rep, lam_star_w))

    pend_abs = jnp.abs(pend)
    pending = rowsum(pend_abs)                 # (1, B) in {0, 1}
    pending_e = exp_m(pending)

    # -- sign check (suspended while a GI add is pending)
    removable = act * (one - eq)
    viol_up = (side > half) & (lam_star < -stol)
    viol_lo = (side <= half) & (lam_star > stol)
    sign_viol = ((removable > half) & (pending_e <= half)) & (viol_up | viol_lo)
    sv_f = sign_viol.astype(f32)
    hv = exp_m(jnp.max(sv_f, axis=0, keepdims=True))

    # -- blocking step
    denom = lam - lam_star
    safe = jnp.where(jnp.abs(denom) > tiny, denom, tiny)
    alpha_i = jnp.where(sign_viol, lam / safe, big)
    alpha_min = jnp.min(alpha_i, axis=0, keepdims=True)
    oh_jb = first_hit_m((alpha_i <= alpha_min).astype(f32))
    alpha = exp_m(jnp.clip(alpha_min, zero, one))
    lam_B = (lam + alpha * (lam_star - lam)) * (one - oh_jb)
    act_B = act * (one - oh_jb)

    # -- working point and candidate selection
    lam_base = pending_e * lam + (one - pending_e) * act * lam_star
    c = dot(G, lam_base)
    cand = (one - act) * (one - immut)
    v_up = jnp.where(cand > half, -(du + c), -big)
    v_lo = jnp.where(cand > half, dl + c, -big)
    v = jnp.maximum(v_up, v_lo)
    vmax = jnp.max(v, axis=0, keepdims=True)
    conv = exp_m(((vmax <= ptol).astype(f32)) * (one - pending))
    oh_jnew = first_hit_m((v >= vmax).astype(f32))

    oh_jsel = pending_e * pend_abs + (one - pending_e) * oh_jnew
    side_new = rowsum(oh_jnew * (v_up >= v_lo).astype(f32))
    side_pend = (rowsum(pend) > zero).astype(f32)
    side_j = exp_m(pending * side_pend + (one - pending) * side_new)
    sgn_j = np.float32(2.0) * side_j - one
    viol_j = exp_m(rowsum(oh_jsel * jnp.where(side_j > half, -(du + c), dl + c)))
    drop_pend = pending_e * ((viol_j <= ptol).astype(f32))

    # -- GI add step in slot space
    Gcol_j = dot(G, oh_jsel) + softd * oh_jsel
    vj = act * (one - oh_jsel) * Gcol_j
    vj_w = gth(vj)
    Rvj_w = mvw(vj_w)
    gjj_sel = rowsum(oh_jsel * Gcol_j)
    gamma = exp_m(gjj_sel) - exp_m(rowsum(vj_w * Rvj_w))
    sgn_s = exp_s(sgn_j[0:1, :])
    dvec_w = sgn_s * Rvj_w
    dvec = blocksum(SEL * dot(Tsm_rep, dvec_w))     # row-space direction
    t_primal = jnp.where(
        gamma > gtol, jnp.maximum(viol_j, zero) / jnp.maximum(gamma, gtol), big
    )
    dir_ok = side * (dvec > zero).astype(f32) + (one - side) * (dvec < zero).astype(f32)
    valid_f = act * (one - eq) * dir_ok
    t_cand = jnp.maximum(lam_base / jnp.where(dvec == zero, one, dvec), zero)
    t_i = jnp.where(valid_f > half, t_cand, big)
    t_min = jnp.min(t_i, axis=0, keepdims=True)
    oh_ib = first_hit_m((t_i <= t_min).astype(f32))
    t_dual = exp_m(t_min)
    full_add = (t_primal <= t_dual).astype(f32)
    t_step = jnp.minimum(t_primal, t_dual)
    no_step = (t_step >= big).astype(f32)
    live = (one - hv) * (one - conv) * (one - drop_pend)
    infeas_now = live * no_step * (one - done)
    # a full add with every slot occupied exceeds the compact capacity
    all_occ = exp_m((jnp.min(occ, axis=0, keepdims=True) > half).astype(f32))
    ovf_now = live * (one - no_step) * full_add * all_occ * (one - done)
    ts = live * (one - no_step) * (one - full_add * all_occ)

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
    pend_G = ts * (one - full_add) * oh_jsel * sgn_j
    keep = (one - ts) * (one - drop_pend)
    new_pend = (one - hv) * (pend_G + keep * pend) + hv * pend
    new_done = done + (one - done) * jnp.maximum(
        (one - hv) * conv, jnp.maximum(infeas_now, ovf_now))

    # -- slot bookkeeping for the single changed row
    is_rem = jnp.maximum(hv, ts * (one - full_add))        # (m, B) const rows
    oh_ch = hv * oh_jb + (one - hv) * (full_add * oh_jsel + (one - full_add) * oh_ib)
    rem_slot = gth(oh_ch)                                   # slot holding ch
    free_slot = first_hit_s(one - occ)                      # first free slot
    is_rem_s = exp_s(is_rem[0:1, :])
    slot_ch = is_rem_s * rem_slot + (one - is_rem_s) * free_slot
    changed = (jnp.maximum(hv, ts) * (one - done))[0:1, :]
    changed_sm = dot(ones_sm, changed)
    delta = dot(Tsm_rep, slot_ch) * tile(oh_ch)     # one-hot (slot_ch, ch)
    sign_sel = one - np.float32(2.0) * dot(ones_sm, is_rem[0:1, :])
    SEL_n = SEL + changed_sm * sign_sel * delta

    # -- rank-2 Woodbury update of Rw at slot_ch (gather the changed row's
    #    Gram column through the UPDATED assignment, slot_ch zeroed)
    Gcol_ch = dot(G, oh_ch) + softd * oh_ch
    vcol_w = dot(S_slot, SEL_n * tile(Gcol_ch)) * (one - slot_ch)
    Re = mvw(slot_ch)
    Rv = mvw(vcol_w)
    gjj = exp_s(rowsum(oh_ch * Gcol_ch))
    a11 = exp_s(rowsum(slot_ch * Re))
    a12 = exp_s(rowsum(slot_ch * Rv))
    a21 = exp_s(rowsum(vcol_w * Re))
    a22 = exp_s(rowsum(vcol_w * Rv))
    irs = is_rem_s
    S00 = jnp.where(irs > half, -a11, a11)
    S01 = jnp.where(irs > half, one - a12, one + a12)
    S10 = jnp.where(irs > half, one - a21, one + a21)
    S11 = jnp.where(irs > half, (one - gjj) - a22, (one - gjj) + a22)
    det = S00 * S11 - S01 * S10
    det = jnp.where(jnp.abs(det) > tiny, det, tiny)
    t0 = (S11 * Re - S10 * Rv) / det
    t1 = (-S01 * Re + S00 * Rv) / det
    upd = dot(Tss_rep, t0) * dot(Tss_tile, Re) + dot(Tss_rep, t1) * dot(Tss_tile, Rv)
    changed_ss = dot(ones_ss, changed)
    upd_signed = jnp.where(dot(ones_ss, is_rem[0:1, :]) > half, upd, -upd)
    Rw_o[:, :] = jnp.where(changed_ss > half, Rw + upd_signed, Rw)
    SEL_o[:, :] = jnp.where(changed_sm > half, SEL_n, SEL)

    gate = lambda new, old: done * old + (one - done) * new
    lam_o[:, :] = gate(new_lam, lam)
    act_o[:, :] = gate(new_act, act)
    side_o[:, :] = gate(new_side, side)
    pend_o[:, :] = gate(new_pend, pend)
    done_o[:, :] = new_done
    infeas_o[:, :] = jnp.maximum(infeas, infeas_now)
    ovf_o[:, :] = jnp.maximum(ovf, ovf_now)


def _build_call(m, s, B, primal_tol, sign_tol, gamma_tol, interpret):
    kernel = functools.partial(
        _ciu_iteration_kernel, m=m, s=s,
        primal_tol=primal_tol, sign_tol=sign_tol, gamma_tol=gamma_tol,
    )
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((m, B), jnp.float32)] * 7 + [
        jax.ShapeDtypeStruct((s * m, B), jnp.float32),
        jax.ShapeDtypeStruct((s * s, B), jnp.float32),
    ]
    return pl.pallas_call(
        kernel,
        in_specs=[vm()] * 20,
        out_specs=[vm()] * 9,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(100 * 1024 * 1024)),
        interpret=interpret,
    )


def _prep(G, softd, du_t, dl_t, eq, immut, lam0, act0, side0, SEL0, Rw0, m, s):
    to_lane = lambda a: jnp.asarray(a, jnp.float32).T
    consts = tuple(jnp.asarray(a) for a in make_ciu_consts(m, s))
    G = jnp.asarray(G, jnp.float32)
    softd = jnp.asarray(softd, jnp.float32).reshape(m, 1)
    eq = jnp.asarray(eq, jnp.float32)
    eq_c = eq.reshape(m, 1) if eq.ndim == 1 else to_lane(eq)
    immut_c = jnp.asarray(immut, jnp.float32).reshape(m, 1)
    du_l, dl_l = to_lane(du_t), to_lane(dl_t)
    lam_l = to_lane(lam0) * to_lane(act0)
    act_l, side_l = to_lane(act0), to_lane(side0)
    B = du_l.shape[1]
    SEL_l = jnp.asarray(SEL0, jnp.float32).reshape(B, s * m).T
    Rw_l = jnp.asarray(Rw0, jnp.float32).reshape(B, s * s).T
    return consts + (G, softd, du_l, dl_l, eq_c, immut_c,
                     lam_l, act_l, side_l, SEL_l, Rw_l)


@functools.partial(
    jax.jit,
    static_argnames=("m", "s", "max_iter", "primal_tol", "sign_tol",
                     "gamma_tol", "interpret", "retry_infeas",
                     "steps_per_check"),
)
def phase1_ciu_pallas_while(
    G, softd, du_t, dl_t, eq, immut, lam0, act0, side0, SEL0, Rw0,
    *,
    m: int,
    s: int,
    max_iter: int,
    primal_tol: float,
    sign_tol: float,
    gamma_tol: float = 3.5e-4,
    interpret: bool = False,
    retry_infeas: bool = True,
    steps_per_check: int = 1,
):
    """Early-exit compact bulk phase. Returns batch-major
    ``(lam, act, side, iters, done, infeas, ovf, SEL, Rw)``.

    ``retry_infeas``: dual-ray verdicts reached from a warm carried state
    are re-checked from a cold start (see phase1_iu_pallas_while).

    ``steps_per_check``: kernel calls per while-loop condition check (a
    done lane freezes inside the kernel, so the only cost of K > 1 is up
    to K-1 no-op kernel calls after the chunk converges, against one
    cond reduction per K calls)."""
    B = du_t.shape[0]
    assert B % LANES == 0, "batch must be a multiple of 128"
    (Tsm_rep, S_slot, Tss_tile, Tss_rep, S_grp_ss,
     Gd, softd_c, du_l, dl_l, eq_c, immut_c,
     lam_l, act_l, side_l, SEL_l, Rw_l) = _prep(
        G, softd, du_t, dl_t, eq, immut, lam0, act0, side0, SEL0, Rw0, m, s)
    call = _build_call(m, s, B, primal_tol, sign_tol, gamma_tol, interpret)

    zero_state = jnp.zeros((m, B), jnp.float32)
    iters0 = jnp.zeros((B,), jnp.float32)
    K = max(1, int(steps_per_check))

    def cond(c):
        *_state, done, _infeas, _ovf, _SEL, _Rw, _iters, it = c
        return (it < max_iter) & (jnp.min(done[0]) < 0.5)

    def body(c):
        lam, act, side, pend, done, infeas, ovf, SEL, Rw, iters, it = c
        for _ in range(K):
            iters = iters + (1.0 - done[0])
            lam, act, side, pend, done, infeas, ovf, SEL, Rw = call(
                Tsm_rep, S_slot, Tss_tile, Tss_rep, S_grp_ss,
                Gd, softd_c, du_l, dl_l, eq_c, immut_c,
                lam, act, side, pend, done, infeas, ovf, SEL, Rw)
        return (lam, act, side, pend, done, infeas, ovf, SEL, Rw, iters, it + K)

    state = (lam_l, act_l, side_l, zero_state, zero_state, zero_state,
             zero_state, SEL_l, Rw_l, iters0, jnp.int32(0))
    lam, act, side, pend, done, infeas, ovf, SEL, Rw, iters, _ = (
        jax.lax.while_loop(cond, body, state))
    if retry_infeas:
        flag = infeas[0:1]
        keep = 1.0 - flag
        eye_flat = jnp.asarray(
            np.eye(s, dtype=np.float32).reshape(s * s, 1))
        lam = lam * keep
        act = act * keep
        side = side * keep + flag
        pend = pend * keep
        done = done * keep
        infeas = infeas * keep
        SEL = SEL * keep                      # all slots free
        Rw = Rw * keep + eye_flat * flag
        lam, act, side, _p, done, infeas, ovf, SEL, Rw, iters, _ = (
            jax.lax.while_loop(cond, body,
                               (lam, act, side, pend, done, infeas, ovf,
                                SEL, Rw, iters, jnp.int32(0))))
    return (lam.T, act.T > 0.5, side.T > 0.5, iters.astype(jnp.int32),
            done[0] > 0.5, infeas[0] > 0.5, ovf[0] > 0.5,
            SEL.T.reshape(B, s * m), Rw.T.reshape(B, s, s))
