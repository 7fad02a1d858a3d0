"""Batched node-frontier branch-and-bound for hybrid MPC.

TPU-native redesign of the per-lane depth-first B&B (ops/bnb.py, the
analog of DAQP's MIQP solver invoked by the reference at
src/utils.jl:277-280). The per-lane formulation nests the relaxation
solver's ``while_loop`` inside each lane's node loop under ``vmap`` --
an op-granular, highly divergent program that stalls at large m and
reproducibly faults the TPU at the reference-default satellite size
(m = 60). Here the tree search is restructured around the hardware:

  * every lane keeps its own DFS node stack (fixed capacity), but each
    outer ROUND pops exactly one node per lane and solves the whole
    frontier of node relaxations as ONE batched Goldfarb-Idnani phase --
    on TPU one fused Pallas kernel per solver iteration across all lanes
    (ops/pallas_iu.py with per-lane equality masks for the fixed binary
    rows), on CPU/f64 the vmapped XLA inverse-update loop;
  * branching, pruning, and incumbent updates are plain batched XLA ops
    between rounds;
  * nodes whose parent bound already exceeds the incumbent are discarded
    at pop time (an inner solve-free pop loop), so lanes do not burn
    rounds on prunable nodes.

Child nodes are warm-started from the parent relaxation's multipliers
and working set (DAQP-style workspace reuse); the carried working-set
inverse is rebuilt per round by a batched masked Cholesky (O(m^3) but
MXU-batched and a rounding error next to the solve itself).

The final incumbent is re-solved in float64 from its optimal active set
(``polish_solution``), so branching in f32 costs accuracy only in which
near-tied node wins, never in the returned controls.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .dual_active_set import (
    LDPArrays,
    Solution,
    _active_set_loop_iu,
    polish_solution,
)

PREC = jax.lax.Precision.HIGHEST


class FrontierState(NamedTuple):
    stack_fixed: jax.Array  # (B, cap, m) bool: binary rows fixed at a bound
    stack_side: jax.Array   # (B, cap, m) bool: which bound (True = upper)
    stack_lam: jax.Array    # (B, cap, m) warm-start multipliers
    stack_act: jax.Array    # (B, cap, m) bool warm-start working set
    stack_ws: jax.Array     # (B, cap, m) bool warm-start working-set sides
    stack_bound: jax.Array  # (B, cap) parent relaxation value (lower bound)
    top: jax.Array          # (B,) int32
    inc_fval: jax.Array     # (B,)
    inc_lam: jax.Array      # (B, m)
    inc_active: jax.Array   # (B, m) bool
    inc_side: jax.Array     # (B, m) bool
    inc_found: jax.Array    # (B,) bool
    nodes: jax.Array        # (B,) int32
    iters: jax.Array        # (B,) int32
    exhausted: jax.Array    # (B,) bool: certificate incomplete (a node was
    #   pruned unconverged -- iteration cap OR a failed full-row residual
    #   check, which on cholesky nodes covers genuinely infeasible nodes)
    capped: jax.Array       # (B,) bool: TRUE budget exhaustion only (a node
    #   relaxation hit its iteration cap); drives the 1-vs-2 status split


def make_xla_relax(arrays: LDPArrays, *, max_iter: int, primal_tol: float,
                   sign_tol: float, mode: str = "iu") -> Callable:
    """Node-relaxation solver: vmapped XLA loop (any backend/dtype; the
    CPU/f64 differential-test path).

    ``mode="iu"``: the GI inverse-update loop -- fast, with dual-ray
    infeasibility detection. ``mode="cholesky"``: the ridge-regularized
    masked-Cholesky loop -- O(m^3) per iteration but the only scheme that
    converges on massively dual-degenerate problems (invpend_contact's
    root relaxation carries 170 active rows against rank(G) = 70; the GI
    scheme cycles or fabricates a dual ray there even with an exact
    inverse). A converged Cholesky node is feasibility-checked against
    the full row set before it is trusted (pseudo-solution guard,
    ``_primal_feasible``); infeasible nodes surface as that check
    failing, never as a false 'no integer-feasible point'."""
    dtype = arrays.G.dtype

    if mode == "cholesky":
        from .dual_active_set import _active_set_loop, _primal_feasible

        def relax(du_n, dl_n, eq_lane, lam0, act0, side0):
            def one(dut, dlt, eql, l0, a0, s0):
                st = _active_set_loop(
                    arrays, dut, dlt, eql, arrays.is_immutable,
                    l0.astype(dtype), a0, s0,
                    max_iter=max_iter, primal_tol=primal_tol,
                    sign_tol=sign_tol, use_cholesky=True,
                )
                feas = _primal_feasible(arrays, dut, dlt, st.lam,
                                        st.active, st.side, primal_tol)
                # a failed full-row residual check is routed to the
                # UNCONVERGED path (exhausted, like iteration-cap
                # exhaustion), never the infeasibility prune: on a
                # degenerate set the ridge residual of a feasible node can
                # spuriously exceed the threshold, and pruning it could
                # certify a suboptimal incumbent (ADVICE r3 #1). Genuinely
                # infeasible nodes land here too -- they still prune (an
                # unconverged node is never expanded) but mark the lane's
                # certificate incomplete instead of claiming -2. The 7th
                # element separates TRUE iteration-cap exhaustion (the
                # only signal that downgrades a found incumbent from
                # proven-optimal 1 to best-under-budget 2, ADVICE r4).
                return (st.lam, st.active, st.side, st.iters,
                        st.done & feas, jnp.zeros_like(feas), ~st.done)

            return jax.vmap(one)(du_n, dl_n, eq_lane, lam0, act0, side0)

        return relax

    def relax(du_n, dl_n, eq_lane, lam0, act0, side0):
        st = jax.vmap(
            lambda dut, dlt, eql, l0, a0, s0: _active_set_loop_iu(
                arrays, dut, dlt, eql, arrays.is_immutable,
                l0.astype(dtype), a0, s0,
                max_iter=max_iter, primal_tol=primal_tol, sign_tol=sign_tol,
            )
        )(du_n, dl_n, eq_lane, lam0, act0, side0)
        return (st.lam, st.active, st.side, st.iters, st.done, st.infeas,
                ~st.done & ~st.infeas)

    return relax


def make_pallas_relax(arrays: LDPArrays, rho_soft, *, max_iter: int,
                      primal_tol: float, sign_tol: float, chunk: int,
                      interpret: bool = False, cold: bool = True) -> Callable:
    """Node-relaxation solver: fused Pallas GI kernel, ``lax.map`` over
    VMEM-bounded lane chunks (requires f32 arrays; batch padded to a
    multiple of the chunk).

    ``cold`` starts every node from an empty working set with the exact
    identity inverse. Measured on the m = 60 satellite: the batched
    masked-Cholesky init a warm start needs costs ~2.7 ms per 128-lane
    chunk per round, while a kernel iteration costs ~8 us -- the extra
    cold iterations are an order of magnitude cheaper than the
    factorization they replace. (Equality/fixed rows may start inactive:
    a satisfied equality with zero multiplier is a valid KKT point, and a
    violated one is added by the normal candidate step.)"""
    from .pallas_iu import init_R_batch, phase1_iu_pallas_while

    m = arrays.G.shape[0]
    eps32 = float(np.finfo(np.float32).eps)
    softd = jnp.asarray(np.asarray(rho_soft, np.float64) + 4 * eps32, jnp.float32)
    immutf = arrays.is_immutable.astype(jnp.float32)

    def relax(du_n, dl_n, eq_lane, lam0, act0, side0):
        B = du_n.shape[0]
        CH = min(chunk, max(128, (B // 128) * 128))
        nc = (B + CH - 1) // CH
        pad = nc * CH - B

        def resh(a):
            if pad:
                a = jnp.concatenate([a, a[:pad]])
            return a.reshape((nc, CH) + a.shape[1:])

        chunk_in = tuple(resh(a) for a in (
            du_n, dl_n, eq_lane.astype(jnp.float32),
            lam0.astype(jnp.float32), act0, side0))

        def one_chunk(args):
            du_c, dl_c, eq_c, l0, a0, s0 = args
            if cold:
                l0 = jnp.zeros((CH, m), jnp.float32)
                a0 = jnp.zeros((CH, m), bool)
                s0 = jnp.ones((CH, m), bool)
                R0 = jnp.broadcast_to(jnp.eye(m, dtype=jnp.float32), (CH, m, m))
            else:
                R0 = init_R_batch(arrays.G_solve, a0)
            out = phase1_iu_pallas_while(
                arrays.G, softd, du_c, dl_c, eq_c, immutf,
                l0, a0.astype(jnp.float32), s0.astype(jnp.float32), R0,
                m=m, max_iter=max_iter,
                primal_tol=primal_tol, sign_tol=sign_tol,
                interpret=interpret, retry_infeas=not cold,
            )
            return out[:6]  # drop the carried R

        outs = jax.lax.map(one_chunk, chunk_in)
        unsh = lambda a: a.reshape((nc * CH,) + a.shape[2:])[:B]
        outs = tuple(unsh(o) for o in outs)
        return outs + (~outs[4] & ~outs[5],)  # capped = ~done & ~infeas

    return relax


def solve_bnb_frontier(
    arrays: LDPArrays,
    arrays_hi: LDPArrays | None,
    thetas: jax.Array,
    relax: Callable,
    *,
    stack_cap: int = 64,
    node_limit: int = 1024,
    bin_tol: float = 1e-6,
    use_cholesky: bool = True,
    warm_nodes: bool = True,
) -> Solution:
    """Solve a batch of hybrid LDP instances with lockstep node rounds.

    ``relax(du_n, dl_n, eq_lane, lam0, act0, side0)`` solves the whole
    frontier of node relaxations and returns batched
    ``(lam, act, side, iters, done, infeas)``.

    ``warm_nodes=False`` drops the warm-start stacks entirely (cold node
    solves -- pair with a ``cold=True`` relax, see ``make_pallas_relax``).
    """
    dtype = arrays.G.dtype
    m = arrays.G.shape[0]
    n = arrays.u_off.shape[0]
    B = thetas.shape[0]
    th = thetas.astype(dtype)
    # finite sentinel, NOT finfo.max: the TPU's emulated f64 is a
    # double-double of f32 pairs whose range tops out near f32's
    # 3.4e38, so finfo(f64).max lands on the device as inf and turns
    # sentinel arithmetic into inf/NaN (inf < inf incumbent tests,
    # 0 * inf masks). 1e30 dominates every reachable fval/bound in
    # both f32 and f64 and stays finite under the emulation
    big = jnp.asarray(min(float(jnp.finfo(dtype).max), 1e30), dtype)
    bidx = jnp.arange(B)
    is_bin = arrays.is_binary
    is_eq = arrays.is_eq
    immut = arrays.is_immutable
    up_f, lo_f = arrays.up_finite, arrays.lo_finite

    # theta-dependent pieces, shared by every node of a lane
    du_t = arrays.du + jnp.dot(th, arrays.Dth.T, precision=PREC)
    dl_t = arrays.dl + jnp.dot(th, arrays.Dth.T, precision=PREC)
    U0 = arrays.u_off + jnp.dot(th, arrays.Uth_off.T, precision=PREC)
    f_t = arrays.f + jnp.dot(th, arrays.f_theta.T, precision=PREC)

    def prune_tops(top, inc_found, inc_fval, stack_bound):
        """Pop (discard) stacked nodes whose parent bound already exceeds
        the incumbent -- no relaxation solve needed."""
        def top_bound(t):
            i = jnp.maximum(t - 1, 0)
            return jnp.take_along_axis(stack_bound, i[:, None], axis=1)[:, 0]

        def cond(t):
            return jnp.any((t > 0) & inc_found & (top_bound(t) >= inc_fval))

        def body(t):
            prunable = (t > 0) & inc_found & (top_bound(t) >= inc_fval)
            return t - prunable.astype(jnp.int32)

        return jax.lax.while_loop(cond, body, top)

    def body(s: FrontierState) -> FrontierState:
        top = prune_tops(s.top, s.inc_found, s.inc_fval, s.stack_bound)
        has_node = (top > 0) & (s.nodes < node_limit)
        hn = has_node[:, None]
        idx = jnp.maximum(top - 1, 0)
        gat = lambda st: jnp.take_along_axis(st, idx[:, None, None], axis=1)[:, 0]
        fixed = gat(s.stack_fixed) & hn
        fside = gat(s.stack_side)
        top = top - has_node.astype(jnp.int32)

        eq_lane = is_eq[None, :] | fixed
        d_f = jnp.where(fside, du_t, dl_t)
        du_n = jnp.where(fixed, d_f, du_t)
        dl_n = jnp.where(fixed, d_f, dl_t)
        if warm_nodes:
            lam0 = gat(s.stack_lam)
            act0 = gat(s.stack_act) | eq_lane
            side0 = jnp.where(fixed, fside, gat(s.stack_ws))
        else:
            lam0 = jnp.zeros((B, m), dtype)
            act0 = jnp.zeros((B, m), bool)
            side0 = jnp.ones((B, m), bool)

        lam, act, side, it_in, done, infeas, capped = relax(
            du_n, dl_n, eq_lane, lam0, act0, side0)

        U = U0 - jnp.dot(lam.astype(dtype), arrays.HinvET.T, precision=PREC)
        fval = (0.5 * jnp.einsum("bi,ij,bj->b", U, arrays.H, U, precision=PREC)
                + jnp.sum(f_t * U, axis=1))
        feasible = done & ~infeas
        unconverged = has_node & ~done & ~infeas
        pruned = (~feasible) | (s.inc_found & (fval >= s.inc_fval))

        # fractionality of unfixed binary rows: distance to the nearer
        # viable bound (matches ops/bnb.py)
        c = jnp.dot(lam.astype(dtype), arrays.G.T, precision=PREC)
        slack_up = jnp.where(up_f[None, :], du_t + c, big)
        slack_lo = jnp.where(lo_f[None, :], -dl_t - c, big)
        frac = jnp.minimum(slack_up, slack_lo)
        branchable = is_bin[None, :] & ~fixed & ~immut[None, :] & (up_f | lo_f)[None, :]
        frac = jnp.where(branchable, frac, -big)
        jb = jnp.argmax(frac, axis=1)
        frac_jb = jnp.take_along_axis(frac, jb[:, None], axis=1)[:, 0]
        integral = frac_jb <= bin_tol

        better = feasible & integral & (~pruned) & (fval < s.inc_fval) & has_node
        bt = better[:, None]
        inc_fval = jnp.where(better, fval, s.inc_fval)
        inc_lam = jnp.where(bt, lam, s.inc_lam)
        # pin every fixed binary row at its branched bound/side: the f64
        # polish solves the UNCLAMPED problem, and a clamped row satisfied
        # with zero multiplier never enters the working set (same fix as
        # the incremental path; without it the polish drifts off the
        # branched bound and returns a wrong optimum with status 1)
        inc_active = jnp.where(bt, act | fixed, s.inc_active)
        inc_side = jnp.where(bt, jnp.where(fixed, fside, side), s.inc_side)
        inc_found = s.inc_found | better

        # branch on jb: push far bound first, near bound last (DFS pops near)
        branch = (~pruned) & (~integral) & has_node
        onehot = jnp.arange(m)[None, :] == jb[:, None]
        child_fixed = fixed | onehot
        su_jb = jnp.take_along_axis(slack_up, jb[:, None], axis=1)[:, 0]
        sl_jb = jnp.take_along_axis(slack_lo, jb[:, None], axis=1)[:, 0]
        near_up = (su_jb <= sl_jb)[:, None]
        far_side = jnp.where(onehot, ~near_up, fside)
        near_side = jnp.where(onehot, near_up, fside)
        lo_jb = lo_f[jb]
        up_jb = up_f[jb]
        far_viable = jnp.where(near_up[:, 0], lo_jb, up_jb)
        w_side_far = jnp.where(onehot, ~near_up, side)
        w_side_near = jnp.where(onehot, near_up, side)
        # an unconverged parent's fval is not a valid bound for children
        child_bound = jnp.where(unconverged, -big, fval)

        st = (s.stack_fixed, s.stack_side, s.stack_lam, s.stack_act,
              s.stack_ws, s.stack_bound)

        def push(st, top, fix, sd, ws, bd, do):
            sf, ss, sl, sa, sw, sb = st
            do = do & (top < stack_cap)
            dom = do[:, None]
            ix = jnp.minimum(top, stack_cap - 1)
            put = lambda A, v: A.at[bidx, ix].set(jnp.where(dom, v, A[bidx, ix]))
            sf = put(sf, fix)
            ss = put(ss, sd)
            if warm_nodes:
                sl = put(sl, lam)
                sa = put(sa, act)
                sw = put(sw, ws)
            sb = sb.at[bidx, ix].set(jnp.where(do, bd, sb[bidx, ix]))
            return (sf, ss, sl, sa, sw, sb), top + do.astype(jnp.int32)

        st, top = push(st, top, child_fixed, far_side, w_side_far, child_bound,
                       branch & far_viable)
        st, top = push(st, top, child_fixed, near_side, w_side_near, child_bound,
                       branch)

        return FrontierState(
            *st, top, inc_fval, inc_lam, inc_active, inc_side, inc_found,
            s.nodes + has_node.astype(jnp.int32),
            s.iters + jnp.where(has_node, it_in.astype(jnp.int32), 0),
            s.exhausted | unconverged,
            s.capped | (has_node & capped),
        )

    def cond(s: FrontierState):
        return jnp.any((s.top > 0) & (s.nodes < node_limit))

    cap_w = stack_cap if warm_nodes else 1
    init = FrontierState(
        stack_fixed=jnp.zeros((B, stack_cap, m), bool),
        stack_side=jnp.zeros((B, stack_cap, m), bool),
        stack_lam=jnp.zeros((B, cap_w, m), dtype),
        stack_act=jnp.zeros((B, cap_w, m), bool),
        stack_ws=jnp.ones((B, cap_w, m), bool),
        stack_bound=jnp.full((B, stack_cap), -big, dtype),
        top=jnp.ones(B, jnp.int32),  # root node: nothing fixed, cold start
        inc_fval=jnp.full(B, big, dtype),
        inc_lam=jnp.zeros((B, m), dtype),
        inc_active=jnp.zeros((B, m), bool),
        inc_side=jnp.zeros((B, m), bool),
        inc_found=jnp.zeros(B, bool),
        nodes=jnp.zeros(B, jnp.int32),
        iters=jnp.zeros(B, jnp.int32),
        exhausted=jnp.zeros(B, bool),
        capped=jnp.zeros(B, bool),
    )
    final = jax.lax.while_loop(cond, body, init)

    # a TRULY budget-limited lane (a node relaxation hit its iteration
    # cap, or the lane hit node_limit) can still hold an exact incumbent,
    # but the tree was not fully explored: report 2 (best found under
    # budget) instead of overstating 1 (proven optimal) -- ADVICE r4.
    # `exhausted` additionally covers unconverged-node prunes (on
    # cholesky nodes: overwhelmingly genuinely infeasible nodes, whose
    # pruning preserves optimality); it keeps driving only the -1/-2
    # split, as before.
    budgeted = final.capped | (final.nodes >= node_limit)
    status = jnp.where(
        final.inc_found,
        jnp.where(budgeted, jnp.int32(2), jnp.int32(1)),
        jnp.where(final.exhausted | budgeted, jnp.int32(-1), jnp.int32(-2)))

    # exact f64 re-solve of each incumbent's optimal active set (includes
    # the fixed binary rows, active at their branched bound)
    hi = arrays if arrays_hi is None else arrays_hi
    sol = jax.vmap(
        lambda t, a, sd: polish_solution(hi, t, a, sd, use_cholesky=use_cholesky)
    )(thetas, final.inc_active, final.inc_side)
    zero_U = jnp.zeros((B, n), sol.U.dtype)
    found = final.inc_found
    fm = found[:, None]
    return Solution(
        jnp.where(fm, sol.U, zero_U),
        jnp.where(fm, sol.lam, jnp.zeros((B, m), sol.lam.dtype)),
        final.inc_active, final.inc_side,
        jnp.where(found, sol.fval, big),
        final.iters, status,
    )


class IncState(NamedTuple):
    """Incremental-frontier state: the GI solver state lives ACROSS
    branch-and-bound rounds (lane-major, matching the Pallas kernel)."""

    stack_fixed: jax.Array  # (B, cap, m) bool
    stack_side: jax.Array   # (B, cap, m) bool
    stack_bound: jax.Array  # (B, cap)
    top: jax.Array          # (B,) int32
    cur_fixed: jax.Array    # (B, m) bool: current node's fixed binaries
    cur_fside: jax.Array    # (B, m) bool
    active_node: jax.Array  # (B,) bool: lane is solving a node
    node_iter: jax.Array    # (B,) int32: iterations spent on current node
    du_l: jax.Array         # (m, B) current node bounds (clamped)
    dl_l: jax.Array         # (m, B)
    eq_l: jax.Array         # (m, B) f32
    lam_l: jax.Array        # (m, B) f32 solver state...
    act_l: jax.Array
    side_l: jax.Array
    pend_l: jax.Array
    done_l: jax.Array
    infeas_l: jax.Array
    R_l: jax.Array          # (m*m, B)
    root_lam_l: jax.Array   # snapshot of the root relaxation's solver
    root_act_l: jax.Array   # state: a valid GI warm start for EVERY node
    root_side_l: jax.Array  # of the lane (the carried inverse R depends
    root_R_l: jax.Array     # only on the active set, not on bounds)
    root_saved: jax.Array   # (B,)
    ray_retry: jax.Array    # (B,) bool: current node already cold-retried
    inc_fval: jax.Array     # (B,)
    inc_active: jax.Array   # (B, m) bool
    inc_side: jax.Array     # (B, m) bool
    inc_found: jax.Array    # (B,)
    nodes: jax.Array        # (B,) int32
    iters: jax.Array        # (B,) int32
    exhausted: jax.Array    # (B,) bool


def solve_bnb_frontier_inc(
    arrays: LDPArrays,
    arrays_hi: LDPArrays | None,
    thetas: jax.Array,
    stepper,
    *,
    stack_cap: int = 64,
    node_limit: int = 1024,
    node_cap: int = 200,
    k_round: int = 8,
    bin_tol: float = 1e-6,
    use_cholesky: bool = True,
    mid_prune: bool = True,
    root_warm: bool = True,
) -> Solution:
    """Incremental node-frontier B&B (the TPU production hybrid path).

    The pop-per-round frontier (``solve_bnb_frontier``) synchronizes every
    round on the slowest lane's relaxation, so most kernel iterations are
    frozen-lane waste. Here the GI solver state (multipliers, working set,
    carried inverse R) is part of the outer loop state: each round runs a
    fixed ``k_round`` fused kernel iterations for EVERY lane, then a
    management step branches/prunes the lanes whose relaxation just
    converged. At a branch the NEAR child continues the parent's solver
    state in place (only the branched row's bounds clamp -- a free warm
    start, the lockstep analog of DAQP's workspace reuse across B&B
    nodes); only backtrack pops pay a cold reset (R = I, empty set).

    ``stepper`` is a ``make_iu_stepper`` closure over the problem arrays.
    """
    dtype = arrays.G.dtype
    m = arrays.G.shape[0]
    n = arrays.u_off.shape[0]
    B = thetas.shape[0]
    th = thetas.astype(dtype)
    # finite sentinel, NOT finfo.max: the TPU's emulated f64 is a
    # double-double of f32 pairs whose range tops out near f32's
    # 3.4e38, so finfo(f64).max lands on the device as inf and turns
    # sentinel arithmetic into inf/NaN (inf < inf incumbent tests,
    # 0 * inf masks). 1e30 dominates every reachable fval/bound in
    # both f32 and f64 and stays finite under the emulation
    big = jnp.asarray(min(float(jnp.finfo(dtype).max), 1e30), dtype)
    bidx = jnp.arange(B)
    is_bin = arrays.is_binary
    is_eq = arrays.is_eq
    immut = arrays.is_immutable
    up_f, lo_f = arrays.up_finite, arrays.lo_finite

    P = jax.lax.Precision.HIGHEST
    du_t = arrays.du + jnp.dot(th, arrays.Dth.T, precision=P)
    dl_t = arrays.dl + jnp.dot(th, arrays.Dth.T, precision=P)
    U0 = arrays.u_off + jnp.dot(th, arrays.Uth_off.T, precision=P)
    f_t = arrays.f + jnp.dot(th, arrays.f_theta.T, precision=P)
    eye_flat = jnp.asarray(np.eye(m, dtype=np.float32).reshape(m * m, 1))

    def prune_tops(top, inc_found, inc_fval, stack_bound):
        def top_bound(t):
            i = jnp.maximum(t - 1, 0)
            return jnp.take_along_axis(stack_bound, i[:, None], axis=1)[:, 0]

        def cond(t):
            return jnp.any((t > 0) & inc_found & (top_bound(t) >= inc_fval))

        def body(t):
            prunable = (t > 0) & inc_found & (top_bound(t) >= inc_fval)
            return t - prunable.astype(jnp.int32)

        return jax.lax.while_loop(cond, body, top)

    def body(s: IncState) -> IncState:
        # ---- K productive kernel iterations for every lane
        solver = (s.lam_l, s.act_l, s.side_l, s.pend_l, s.done_l, s.infeas_l, s.R_l)
        solver, steps = stepper(s.du_l, s.dl_l, s.eq_l, solver)
        lam_l, act_l, side_l, pend_l, done_l, infeas_l, R_l = solver
        steps_i = steps.astype(jnp.int32)
        iters = s.iters + steps_i
        node_iter = s.node_iter + steps_i

        # ---- management (batch-major views of the small state)
        done = done_l[0] > 0.5
        infeas = infeas_l[0] > 0.5
        lam = lam_l.T
        act = act_l.T > 0.5
        side = side_l.T > 0.5
        conv = s.active_node & done & ~infeas
        nfail_exh = s.active_node & ~done & (node_iter >= node_cap)
        # a dual-ray verdict reached from WARM carried state (root
        # snapshot + chained rank-2 updates) is not trusted: the node is
        # re-solved once from a genuinely cold start (empty set, identity
        # R); only a ray found on the retry prunes the node
        ray = s.active_node & done & infeas
        retry = ray & ~s.ray_retry
        nfail = (ray & s.ray_retry) | nfail_exh

        U = U0 - jnp.dot(lam.astype(dtype), arrays.HinvET.T, precision=P)
        fval = (0.5 * jnp.einsum("bi,ij,bj->b", U, arrays.H, U, precision=P)
                + jnp.sum(f_t * U, axis=1))
        pruned_conv = conv & s.inc_found & (fval >= s.inc_fval)

        c = jnp.dot(lam.astype(dtype), arrays.G.T, precision=P)

        # mid-solve bound pruning: every GI iterate is dual feasible, so
        # the dual value g(lam) = fval(U(lam)) - sum_act lam_i (d_side+c)_i
        # is a valid lower bound on the node optimum at EVERY iteration --
        # abandon the node as soon as it crosses the incumbent (with an
        # f32 safety margin), instead of iterating it to convergence
        d_side_n = jnp.where(side, s.du_l.T, s.dl_l.T).astype(dtype)
        gval = fval - jnp.sum(
            jnp.where(act, lam.astype(dtype) * (d_side_n + c), 0.0), axis=1)
        prune_mid = (s.active_node & ~done & s.inc_found
                     & (gval >= s.inc_fval + 1e-4 * (1.0 + jnp.abs(s.inc_fval))))
        if not mid_prune:
            prune_mid = jnp.zeros(B, bool)
        slack_up = jnp.where(up_f[None, :], du_t + c, big)
        slack_lo = jnp.where(lo_f[None, :], -dl_t - c, big)
        frac = jnp.minimum(slack_up, slack_lo)
        branchable = (is_bin[None, :] & ~s.cur_fixed & ~immut[None, :]
                      & (up_f | lo_f)[None, :])
        frac = jnp.where(branchable, frac, -big)
        jb = jnp.argmax(frac, axis=1)
        frac_jb = jnp.take_along_axis(frac, jb[:, None], axis=1)[:, 0]
        integral = frac_jb <= bin_tol

        # snapshot the ROOT relaxation's solver state on its first
        # convergence: a valid warm start for every later node of the lane
        save = conv & ~s.root_saved
        sv = save[None, :]
        root_lam_l = jnp.where(sv, lam_l, s.root_lam_l)
        root_act_l = jnp.where(sv, act_l, s.root_act_l)
        root_side_l = jnp.where(sv, side_l, s.root_side_l)
        root_R_l = jnp.where(jnp.broadcast_to(sv, R_l.shape), R_l, s.root_R_l)
        root_saved = s.root_saved | save

        better = conv & (~pruned_conv) & integral & (fval < s.inc_fval)
        bt = better[:, None]
        inc_fval = jnp.where(better, fval, s.inc_fval)
        # the recorded active set must PIN every fixed binary row at its
        # branched bound for the final f64 polish (which solves the
        # UNCLAMPED problem): a fixed row satisfied at its clamped bound
        # with zero multiplier never enters the working set, and a
        # clamped row (du == dl) added mid-solve can carry the wrong side
        # label on the tie -- force membership and the branched side
        inc_active = jnp.where(bt, act | s.cur_fixed, s.inc_active)
        inc_side = jnp.where(bt, jnp.where(s.cur_fixed, s.cur_fside, side),
                             s.inc_side)
        inc_found = s.inc_found | better

        # ---- branch: push the far child, continue the near child in place
        branch = conv & (~pruned_conv) & (~integral)
        onehot = jnp.arange(m)[None, :] == jb[:, None]
        su_jb = jnp.take_along_axis(slack_up, jb[:, None], axis=1)[:, 0]
        sl_jb = jnp.take_along_axis(slack_lo, jb[:, None], axis=1)[:, 0]
        near_up = (su_jb <= sl_jb)[:, None]
        child_fixed = s.cur_fixed | onehot
        far_side = jnp.where(onehot, ~near_up, s.cur_fside)
        far_viable = jnp.where(near_up[:, 0], lo_f[jb], up_f[jb])

        do_push = branch & far_viable & (s.top < stack_cap)
        ix = jnp.minimum(s.top, stack_cap - 1)
        dom = do_push[:, None]
        stack_fixed = s.stack_fixed.at[bidx, ix].set(
            jnp.where(dom, child_fixed, s.stack_fixed[bidx, ix]))
        stack_side = s.stack_side.at[bidx, ix].set(
            jnp.where(dom, far_side, s.stack_side[bidx, ix]))
        stack_bound = s.stack_bound.at[bidx, ix].set(
            jnp.where(do_push, fval, s.stack_bound[bidx, ix]))
        top = s.top + do_push.astype(jnp.int32)

        cur_fixed = jnp.where(branch[:, None], child_fixed, s.cur_fixed)
        cur_fside = jnp.where(branch[:, None] & onehot, near_up, s.cur_fside)
        nodes = s.nodes + branch.astype(jnp.int32)

        # clamp the branched row in the lane-major bounds; mark it equality
        d_up_jb = jnp.take_along_axis(du_t, jb[:, None], axis=1)[:, 0]
        d_lo_jb = jnp.take_along_axis(dl_t, jb[:, None], axis=1)[:, 0]
        d_b = jnp.where(near_up[:, 0], d_up_jb, d_lo_jb).astype(jnp.float32)
        oh_l = onehot.T  # (m, B)
        bm = branch[None, :]
        du_l = jnp.where(oh_l & bm, d_b[None, :], s.du_l)
        dl_l = jnp.where(oh_l & bm, d_b[None, :], s.dl_l)
        eq_l = jnp.maximum(s.eq_l, (oh_l & bm).astype(jnp.float32))
        # the near child resumes the parent's solver state: clear done
        done_l = done_l * (1.0 - branch.astype(jnp.float32))[None, :]

        finished = (conv & (pruned_conv | integral)) | nfail | prune_mid
        active_node = s.active_node & ~finished
        exhausted = s.exhausted | nfail_exh
        node_iter = jnp.where(branch | finished | retry, 0, node_iter)
        ray_retry = jnp.where(branch | finished, False, s.ray_retry | retry)

        # ---- backtrack pops for idle lanes (root-warm solver reset)
        top = prune_tops(top, inc_found, inc_fval, stack_bound)
        can_pop = (~active_node) & (top > 0) & (nodes < node_limit)
        pidx = jnp.maximum(top - 1, 0)
        gat = lambda st: jnp.take_along_axis(st, pidx[:, None, None], axis=1)[:, 0]
        pop_fixed = gat(stack_fixed)
        pop_fside = gat(stack_side)
        top = top - can_pop.astype(jnp.int32)
        nodes = nodes + can_pop.astype(jnp.int32)
        cp = can_pop[:, None]
        cur_fixed = jnp.where(cp, pop_fixed, cur_fixed)
        cur_fside = jnp.where(cp, pop_fside, cur_fside)
        active_node = active_node | can_pop

        d_f = jnp.where(pop_fside, du_t, dl_t)
        du_n = jnp.where(pop_fixed, d_f, du_t).astype(jnp.float32)
        dl_n = jnp.where(pop_fixed, d_f, dl_t).astype(jnp.float32)
        eq_n = (is_eq[None, :] | pop_fixed).astype(jnp.float32)
        cpl = can_pop[None, :]
        cpf = cpl.astype(jnp.float32)
        du_l = jnp.where(cpl, du_n.T, du_l)
        dl_l = jnp.where(cpl, dl_n.T, dl_l)
        eq_l = jnp.where(cpl, eq_n.T, eq_l)
        # restore the root snapshot (cold zeros/identity before the root
        # converged -- the init values of the root_* buffers)
        if root_warm:
            lam_l = jnp.where(cpl, root_lam_l, lam_l)
            act_l = jnp.where(cpl, root_act_l, act_l)
            side_l = jnp.where(cpl, root_side_l, side_l)
            R_l = jnp.where(jnp.broadcast_to(cpl, R_l.shape), root_R_l, R_l)
        else:
            lam_l = lam_l * (1.0 - cpf)
            act_l = act_l * (1.0 - cpf)
            side_l = jnp.where(cpl, 1.0, side_l)
            R_l = jnp.where(jnp.broadcast_to(cpl, R_l.shape), eye_flat, R_l)
        pend_l = pend_l * (1.0 - cpf)
        infeas_l = infeas_l * (1.0 - cpf)
        # popped lanes resume; permanently idle lanes freeze in the kernel
        idle = ~active_node
        done_l = jnp.where((cpl | idle[None, :]),
                           jnp.where(cpl, 0.0, 1.0), done_l)

        # ray-retry lanes restart the SAME node from a genuinely cold
        # state (not the root snapshot, whose carried R may hold the very
        # drift that fabricated the ray)
        rty = retry[None, :]
        rtf = rty.astype(jnp.float32)
        lam_l = lam_l * (1.0 - rtf)
        act_l = act_l * (1.0 - rtf)
        side_l = jnp.where(rty, 1.0, side_l)
        pend_l = pend_l * (1.0 - rtf)
        infeas_l = infeas_l * (1.0 - rtf)
        done_l = done_l * (1.0 - rtf)
        R_l = jnp.where(jnp.broadcast_to(rty, R_l.shape), eye_flat, R_l)

        return IncState(
            stack_fixed, stack_side, stack_bound, top,
            cur_fixed, cur_fside, active_node, node_iter,
            du_l, dl_l, eq_l,
            lam_l, act_l, side_l, pend_l, done_l, infeas_l, R_l,
            root_lam_l, root_act_l, root_side_l, root_R_l, root_saved,
            ray_retry, inc_fval, inc_active, inc_side, inc_found,
            nodes, iters, exhausted,
        )

    def cond(s: IncState):
        return jnp.any(s.active_node | ((s.top > 0) & (s.nodes < node_limit)))

    f32 = jnp.float32
    init = IncState(
        stack_fixed=jnp.zeros((B, stack_cap, m), bool),
        stack_side=jnp.zeros((B, stack_cap, m), bool),
        stack_bound=jnp.full((B, stack_cap), -big, dtype),
        top=jnp.zeros(B, jnp.int32),
        cur_fixed=jnp.zeros((B, m), bool),
        cur_fside=jnp.zeros((B, m), bool),
        active_node=jnp.ones(B, bool),  # root is the initial node
        node_iter=jnp.zeros(B, jnp.int32),
        du_l=du_t.astype(f32).T,
        dl_l=dl_t.astype(f32).T,
        eq_l=jnp.broadcast_to(is_eq.astype(f32)[:, None], (m, B)),
        lam_l=jnp.zeros((m, B), f32),
        act_l=jnp.zeros((m, B), f32),
        side_l=jnp.ones((m, B), f32),
        pend_l=jnp.zeros((m, B), f32),
        done_l=jnp.zeros((m, B), f32),
        infeas_l=jnp.zeros((m, B), f32),
        R_l=jnp.broadcast_to(eye_flat, (m * m, B)),
        root_lam_l=jnp.zeros((m, B), f32),
        root_act_l=jnp.zeros((m, B), f32),
        root_side_l=jnp.ones((m, B), f32),
        root_R_l=jnp.broadcast_to(eye_flat, (m * m, B)),
        root_saved=jnp.zeros(B, bool),
        ray_retry=jnp.zeros(B, bool),
        inc_fval=jnp.full(B, big, dtype),
        inc_active=jnp.zeros((B, m), bool),
        inc_side=jnp.zeros((B, m), bool),
        inc_found=jnp.zeros(B, bool),
        nodes=jnp.ones(B, jnp.int32),
        iters=jnp.zeros(B, jnp.int32),
        exhausted=jnp.zeros(B, bool),
    )
    final = jax.lax.while_loop(cond, body, init)

    # 1 = proven optimal; 2 = exact incumbent but budget-limited search.
    # This path's `exhausted` is budget-only by construction (cap-hit
    # nodes; ray prunes are cold-retry-certified infeasible) -- ADVICE r4
    budgeted = final.exhausted | (final.nodes >= node_limit)
    status = jnp.where(
        final.inc_found,
        jnp.where(budgeted, jnp.int32(2), jnp.int32(1)),
        jnp.where(budgeted, jnp.int32(-1), jnp.int32(-2)))
    if arrays_hi is not None and dtype == jnp.float32:
        # f64-accurate incumbent recovery WITHOUT an emulated-f64 Cholesky
        # (op-granular f64 decompositions dominate wall time on TPU): f32
        # masked inverse (batched Cholesky + Newton-Schulz) as the
        # preconditioner for a short f64 Richardson iteration -- the same
        # finishing pattern as the engine's production large-m tier
        sol = _refined_polish(arrays, arrays_hi, thetas,
                              final.inc_active, final.inc_side)
    else:
        hi = arrays if arrays_hi is None else arrays_hi
        sol = jax.vmap(
            lambda t, a, sd: polish_solution(hi, t, a, sd, use_cholesky=use_cholesky)
        )(thetas, final.inc_active, final.inc_side)
    found = final.inc_found
    fm = found[:, None]
    # a found incumbent whose polish residual stalled is not optimal
    status = jnp.where(found & (sol.status != 1), jnp.int32(-1), status)
    return Solution(
        jnp.where(fm, sol.U, jnp.zeros((B, n), sol.U.dtype)),
        jnp.where(fm, sol.lam, jnp.zeros((B, m), sol.lam.dtype)),
        final.inc_active, final.inc_side,
        jnp.where(found, sol.fval, big),
        final.iters, status,
    )


def _refined_polish(arrays: LDPArrays, hi: LDPArrays, thetas, act, side,
                    refine: int = 12) -> Solution:
    """Batched active-set re-solve: f32 masked inverse + f64 Richardson.
    Status gates on the relative working-set residual -- a stalled
    Richardson (ill-conditioned incumbent set) must not be reported as
    optimal (mirrors the engine's fused-rollout convention)."""
    from .pallas_iu import init_R_batch

    f64 = jnp.float64
    R = init_R_batch(arrays.G_solve, act)          # (B, m, m) f32
    th64 = thetas.astype(f64)
    du_h = hi.du + th64 @ hi.Dth.T
    dl_h = hi.dl + th64 @ hi.Dth.T
    actf = act.astype(f64)
    d_side = jnp.where(side, du_h, dl_h)
    rhs = -actf * d_side
    applyR = lambda v: jnp.einsum(
        "bij,bj->bi", R, v.astype(jnp.float32), precision=PREC).astype(f64)
    mask_apply = lambda v: actf * ((v * actf) @ hi.G_solve.T) + (1.0 - actf) * v
    lam = applyR(rhs)
    for _ in range(refine):
        lam = lam + applyR(rhs - mask_apply(lam))
    U = hi.u_off + th64 @ hi.Uth_off.T - lam @ hi.HinvET.T
    f_t = hi.f + th64 @ hi.f_theta.T
    fval = 0.5 * jnp.einsum("bi,ij,bj->b", U, hi.H, U) + jnp.sum(f_t * U, axis=1)
    sys_res = jnp.max(jnp.abs(mask_apply(lam) - rhs), axis=1)
    res_scale = 1.0 + jnp.max(jnp.abs(rhs), axis=1)
    status = jnp.where(sys_res <= 1e-6 * res_scale,
                       jnp.int32(1), jnp.int32(-1))
    B = thetas.shape[0]
    return Solution(U, lam, act, side, fval, jnp.zeros(B, jnp.int32), status)


# ---------------------------------------------------------------------------
# Host-driven chunked frontier: bounded device programs for runtimes that
# kill long-running programs.
# ---------------------------------------------------------------------------


class ChunkState(NamedTuple):
    """Chunked-frontier state: the CURRENT node's relaxation lives across
    rounds (batch-major, engine dtype), so each device program is a
    bounded K-iteration slice instead of a full tree search."""

    stack_fixed: jax.Array  # (B, cap, m) bool
    stack_side: jax.Array   # (B, cap, m) bool
    stack_lam: jax.Array    # (B, cap, m)
    stack_act: jax.Array    # (B, cap, m) bool
    stack_ws: jax.Array     # (B, cap, m) bool
    stack_bound: jax.Array  # (B, cap)
    stack_R: jax.Array      # (B, cap, m, m) parent's maintained inverse
    #   (fast_nodes only; (B, 1, 1, 1) dummy otherwise)
    occ: jax.Array          # (B, cap) bool open-node occupancy (best_first
    #   only; (B, 1) dummy in LIFO mode, where `top` encodes the stack)
    top: jax.Array          # (B,) int32 (open-node COUNT in best_first)
    cur_fixed: jax.Array    # (B, m) bool: current node's fixed binaries
    cur_fside: jax.Array    # (B, m) bool
    lam: jax.Array          # (B, m) current relaxation state
    act: jax.Array          # (B, m) bool
    side: jax.Array         # (B, m) bool
    R: jax.Array            # (B, m, m) carried ridged masked inverse
    #   (fast_nodes only; (B, 1, 1) dummy otherwise)
    node_iter: jax.Array    # (B,) int32
    active_node: jax.Array  # (B,) bool
    inc_fval: jax.Array
    inc_lam: jax.Array
    inc_active: jax.Array
    inc_side: jax.Array
    inc_found: jax.Array
    nodes: jax.Array
    iters: jax.Array
    exhausted: jax.Array    # certificate incomplete (cap-hit OR
    #   residual-fail prune; the latter is overwhelmingly genuine node
    #   infeasibility on cholesky relaxations)
    capped: jax.Array       # TRUE budget exhaustion only (1-vs-2 split)
    reseeds: jax.Array      # (B,) int32 drift-certificate reseed count


def make_frontier_rounds(
    arrays: LDPArrays,
    arrays_hi: LDPArrays | None,
    *,
    stack_cap: int = 64,
    node_limit: int = 1024,
    node_cap: int = 512,
    k_chunk: int = 16,
    bin_tol: float = 1e-6,
    primal_tol: float = 1e-6,
    sign_tol: float = 1e-11,
    use_cholesky: bool = True,
    poll_every: int = 1,
    fast_nodes: bool = True,
    best_first: bool | None = None,
    drift_tol: float = 1e-2,
    stale_tol: float = 1e30,
    ridge: float | None = None,
) -> Callable:
    """Build a host-driven chunked-frontier solver (masked-Cholesky node
    relaxations at the arrays' dtype -- the emulated-f64 path for
    reduced-precision engines on TPU).

    ``solve_bnb_frontier`` runs the whole tree search as ONE device
    program: an outer ``while_loop`` over node rounds, each round a full
    node relaxation (itself up to ``node_cap`` masked-Cholesky
    iterations). On the axon TPU runtime, long-running device programs
    are killed (observed as ``UNAVAILABLE: TPU device error`` a couple of
    minutes in) -- an honest invpend_contact tree needs thousands of
    emulated-f64 Cholesky iterations and cannot fit one program.

    Here the tree search is restructured as a HOST loop of bounded
    device programs: the current node's relaxation state (multipliers,
    working set, side labels) is part of the carried state, each program
    advances every lane by at most ``k_chunk`` relaxation iterations and
    then runs the branch/prune/incumbent management for lanes whose node
    just converged. Enqueueing is cheap (~50 us under the tunnel) and the
    device runs programs back-to-back; the host blocks only on the
    ``any_active`` scalar every ``poll_every`` rounds, so tunnel latency
    (~25 ms per blocking fetch) amortizes over the K Cholesky iterations
    of real work per program.

    Round-5 speedups for the full-size contact tree (VERDICT r4 #2):

    * ``fast_nodes`` now CARRIES the Woodbury/Newton-Schulz-maintained
      inverse across rounds (and through the stack for far children,
      aligned at pop/branch transitions by the same rank-2 add update the
      in-loop scheme uses) instead of re-seeding every round with a
      batched emulated-f64 Cholesky (~50 ms/round on axon, ~60% of the
      r4 contact wall time). A per-round drift certificate
      ``max|I - M R|`` reseeds any lane whose carried inverse degrades
      (lax.cond -- the factorization only runs when triggered). The
      in-loop staleness gate defaults OFF (``stale_tol=1e30``): its
      refinement-correction threshold, tuned on CPU f64, misfires under
      the TPU's emulated double-double f64 (measured m=142: reseeds on
      ~90% of rounds, 1102 s vs 234 s with the gate off) -- the
      end-of-round certificate catches genuine garbage at ~8% of rounds
      worst case.
    * ``best_first`` (default: follows ``fast_nodes``) replaces the LIFO
      pop with bound-ordered node selection once an incumbent exists
      (deepest-first diving before), over an occupancy-mask stack.
      A push that finds no free slot marks the lane ``capped`` (honest
      status 2) instead of silently dropping the subtree.

    B&B semantics otherwise match ``solve_bnb_frontier`` (warm children,
    bound pruning at pop AND at convergence, done-but-infeasible nodes
    routed to the unconverged/exhausted path, f64 incumbent polish);
    ``best_first=False, fast_nodes=False`` reproduces the monolithic DFS
    bit-for-bit (tests/test_hybrid.py::test_frontier_rounds_matches_monolithic).
    """
    from .dual_active_set import _active_set_loop, _primal_feasible

    if best_first is None:
        best_first = fast_nodes
    dtype = arrays.G.dtype
    m = arrays.G.shape[0]
    big = jnp.asarray(min(float(jnp.finfo(dtype).max), 1e30), dtype)
    is_bin = arrays.is_binary
    nb = int(np.asarray(is_bin).sum())
    is_eq = arrays.is_eq
    immut = arrays.is_immutable
    up_f, lo_f = arrays.up_finite, arrays.lo_finite

    eps_d = jnp.finfo(dtype).eps
    # the MAINTAINED system's ridge. Default: 1e-8 (vs the refactorizing
    # loop's 100 m eps ~ 2e-12 at f64) -- G is row-normalized to unit
    # diagonal, so this bounds ||R|| <= 1e8 and with it the Woodbury/NS
    # rounding amplification on massively dual-degenerate working sets.
    # Measured on the m=88 contact tree (same 415-node tree in every
    # variant): tiny ridge = 19.3k iterations with near-constant
    # staleness reseeds; ridge 1e-8 = 5.1k iterations (shorter even than
    # the exact-solve scheme's 7.1k -- fewer sign-noise blocking steps)
    # with ~50 reseeds total. Solution accuracy is unaffected: the
    # feasibility check and the f64 incumbent polish use the true system.
    # The ridge MUST be identical between the seeds / transition updates
    # here and the in-loop iteration (a mismatch makes every freshly
    # seeded inverse look stale and permafreezes lanes).
    ridge_v = max(100.0 * float(m) * float(eps_d),
                  1e-8) if ridge is None else ridge
    Gsr = arrays.G_solve + ridge_v * jnp.eye(m, dtype=dtype)
    eye_m = jnp.eye(m, dtype=dtype)

    def seed_R(a0):
        """Real factorization of one lane's ridged masked system: batched
        Cholesky + 2 Newton-Schulz passes (as _masked_inverse)."""
        from jax.scipy.linalg import cho_solve

        af = a0.astype(dtype)
        M0 = Gsr * af[:, None] * af[None, :] + jnp.diag(1.0 - af)
        L = jnp.linalg.cholesky(M0)
        R0 = cho_solve((L, True), eye_m)
        for _ in range(2):
            MR = jnp.dot(M0, R0, precision=PREC)
            R0 = jnp.dot(R0, 2.0 * eye_m - MR, precision=PREC)
        return R0

    def masked_M(af):
        """Batched ridged masked system for activity pattern af (B, m)."""
        return (Gsr[None] * af[:, :, None] * af[:, None, :]
                + eye_m[None] * (1.0 - af)[:, :, None])

    def wu_add(R, act_new, oh, do):
        """Batched rank-2 Woodbury ADD of the one-hot row ``oh`` (already
        included in ``act_new``) into the ridged masked inverse, plus one
        Newton-Schulz pass -- the out-of-loop twin of the update inside
        ``_active_set_loop_wu`` (is_rem=False case). Lanes with do=False
        keep R untouched."""
        ohf = oh.astype(dtype)
        af = act_new.astype(dtype)
        Gcol = jnp.einsum("ij,bj->bi", Gsr, ohf, precision=PREC)
        gjj = jnp.sum(ohf * Gcol, axis=1)
        vcol = af * (1.0 - ohf) * Gcol
        Re = jnp.einsum("bij,bj->bi", R, ohf, precision=PREC)
        Rv = jnp.einsum("bij,bj->bi", R, vcol, precision=PREC)
        a11 = jnp.sum(ohf * Re, axis=1)
        a12 = jnp.sum(ohf * Rv, axis=1)
        a21 = jnp.sum(vcol * Re, axis=1)
        a22 = jnp.sum(vcol * Rv, axis=1)
        S00 = a11
        S01 = 1.0 + a12
        S10 = 1.0 + a21
        S11 = (1.0 - gjj) + a22
        det = S00 * S11 - S01 * S10
        det = jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
        t0 = (S11[:, None] * Re - S10[:, None] * Rv) / det[:, None]
        t1 = (-S01[:, None] * Re + S00[:, None] * Rv) / det[:, None]
        upd = (t0[:, :, None] * Re[:, None, :]
               + t1[:, :, None] * Rv[:, None, :])
        R_new = R - upd
        MR = jnp.einsum("bij,bjk->bik", masked_M(af), R_new, precision=PREC)
        R_ns = jnp.einsum("bij,bjk->bik", R_new, 2.0 * eye_m[None] - MR,
                          precision=PREC)
        return jnp.where(do[:, None, None], R_ns, R)

    def prune_tops(top, inc_found, inc_fval, stack_bound):
        def top_bound(t):
            i = jnp.maximum(t - 1, 0)
            return jnp.take_along_axis(stack_bound, i[:, None], axis=1)[:, 0]

        def cond(t):
            return jnp.any((t > 0) & inc_found & (top_bound(t) >= inc_fval))

        def body(t):
            prunable = (t > 0) & inc_found & (top_bound(t) >= inc_fval)
            return t - prunable.astype(jnp.int32)

        return jax.lax.while_loop(cond, body, top)

    def step(s: ChunkState, du_t, dl_t, U0, f_t):
        B = du_t.shape[0]
        bidx = jnp.arange(B)
        cap = s.stack_bound.shape[1]

        # ---- bound-prune open nodes, then pop one for idle lanes
        if best_first:
            occ = s.occ & ~(s.inc_found[:, None]
                            & (s.stack_bound >= s.inc_fval[:, None]))
            can_pop = ((~s.active_node) & jnp.any(occ, axis=1)
                       & (s.nodes < node_limit))
            # bound-ordered pop once an incumbent prunes (the classic
            # best-first reduction of the proof tree); deepest-first
            # before (the DFS dive that finds the first incumbent) AND
            # when the open list nears capacity -- deepest subtrees
            # terminate soonest, draining slots, so a dive started with
            # `bf_margin` free slots cannot overflow the stack
            bf_margin = min(cap - 1, nb + 2)
            depth = jnp.sum(s.stack_fixed, axis=2, dtype=jnp.int32)
            key_bound = jnp.where(occ, s.stack_bound, big)
            key_depth = jnp.where(occ, depth, -1)
            room = jnp.sum(occ, axis=1) < (cap - bf_margin)
            pidx = jnp.where(s.inc_found & room,
                             jnp.argmin(key_bound, axis=1),
                             jnp.argmax(key_depth, axis=1)).astype(jnp.int32)
            occ = occ.at[bidx, pidx].set(
                jnp.where(can_pop, False, occ[bidx, pidx]))
            top = jnp.sum(occ, axis=1, dtype=jnp.int32)
        else:
            occ = s.occ
            top = prune_tops(s.top, s.inc_found, s.inc_fval, s.stack_bound)
            can_pop = (~s.active_node) & (top > 0) & (s.nodes < node_limit)
            pidx = jnp.maximum(top - 1, 0)
            top = top - can_pop.astype(jnp.int32)
        gat = lambda st: jnp.take_along_axis(
            st, pidx[:, None, None], axis=1)[:, 0]
        pop_fixed = gat(s.stack_fixed)
        pop_fside = gat(s.stack_side)
        pop_lam = gat(s.stack_lam)
        pop_act = gat(s.stack_act)
        pop_ws = gat(s.stack_ws)
        nodes = s.nodes + can_pop.astype(jnp.int32)
        cp = can_pop[:, None]
        cur_fixed = jnp.where(cp, pop_fixed, s.cur_fixed)
        cur_fside = jnp.where(cp, pop_fside, s.cur_fside)
        eq_lane = is_eq[None, :] | cur_fixed
        lam = jnp.where(cp, pop_lam, s.lam)
        act = jnp.where(cp, pop_act | (is_eq[None, :] | pop_fixed), s.act)
        side = jnp.where(cp, jnp.where(pop_fixed, pop_fside, pop_ws), s.side)
        node_iter = jnp.where(can_pop, 0, s.node_iter)
        active = s.active_node | can_pop

        if fast_nodes:
            # the popped entry stores the PARENT's maintained inverse;
            # the child's working set additionally holds the branched
            # row (fixed at the far bound): one rank-2 Woodbury add +
            # NS pass aligns R without any factorization
            pop_R = jnp.take_along_axis(
                s.stack_R, pidx[:, None, None, None], axis=1)[:, 0].astype(dtype)
            R = jnp.where(can_pop[:, None, None], pop_R, s.R)
            new_row = pop_fixed & ~pop_act
            R = wu_add(R, act, new_row, can_pop & jnp.any(new_row, axis=1))
        else:
            R = s.R

        # ---- node bounds from the fixed set
        d_f = jnp.where(cur_fside, du_t, dl_t)
        du_n = jnp.where(cur_fixed, d_f, du_t)
        dl_n = jnp.where(cur_fixed, d_f, dl_t)

        # ---- at most k_chunk relaxation iterations for active lanes
        # (idle lanes enter with iters0 = k_chunk, so the batched
        # while_loop's per-lane select freezes them)
        it0 = jnp.where(active, 0, k_chunk).astype(jnp.int32)

        if fast_nodes:
            from .dual_active_set import _active_set_loop_wu

            def one(dut, dlt, eql, l0, a0, s0, r0, i0):
                return _active_set_loop_wu(
                    arrays, dut, dlt, eql, immut, l0, a0, s0, r0,
                    max_iter=k_chunk, primal_tol=primal_tol,
                    sign_tol=sign_tol, iters0=i0, stale_tol=stale_tol,
                    ridge=ridge_v)

            st, R, stale_l = jax.vmap(one)(
                du_n, dl_n, eq_lane, lam, act, side, R, it0)
        else:
            def one(dut, dlt, eql, l0, a0, s0, i0):
                return _active_set_loop(
                    arrays, dut, dlt, eql, immut, l0, a0, s0,
                    max_iter=k_chunk, primal_tol=primal_tol,
                    sign_tol=sign_tol,
                    use_cholesky=use_cholesky, iters0=i0)

            st = jax.vmap(one)(du_n, dl_n, eq_lane, lam, act, side, it0)
        stepped = jnp.maximum(st.iters - it0, 0)
        lam = jnp.where(active[:, None], st.lam, lam)
        act = jnp.where(active[:, None], st.active, act)
        side = jnp.where(active[:, None], st.side, side)
        node_iter = node_iter + stepped
        iters = s.iters + jnp.where(active, stepped, 0)
        done_k = active & st.done

        feas = jax.vmap(
            lambda dut, dlt, l, a, sd: _primal_feasible(
                arrays, dut, dlt, l, a, sd, primal_tol)
        )(du_n, dl_n, lam, act, side)
        conv = done_k & feas
        # done-but-infeasible is routed to the unconverged path (ADVICE
        # r3 #1): prune, mark the certificate incomplete, never claim -2
        nfail_cap = active & ~st.done & (node_iter >= node_cap)
        nfail = (done_k & ~feas) | nfail_cap

        # ---- management for converged nodes
        U = U0 - jnp.dot(lam.astype(dtype), arrays.HinvET.T, precision=PREC)
        fval = (0.5 * jnp.einsum("bi,ij,bj->b", U, arrays.H, U, precision=PREC)
                + jnp.sum(f_t * U, axis=1))
        pruned_conv = conv & s.inc_found & (fval >= s.inc_fval)

        c = jnp.dot(lam.astype(dtype), arrays.G.T, precision=PREC)
        slack_up = jnp.where(up_f[None, :], du_t + c, big)
        slack_lo = jnp.where(lo_f[None, :], -dl_t - c, big)
        frac = jnp.minimum(slack_up, slack_lo)
        branchable = (is_bin[None, :] & ~cur_fixed & ~immut[None, :]
                      & (up_f | lo_f)[None, :])
        frac = jnp.where(branchable, frac, -big)
        jb = jnp.argmax(frac, axis=1)
        frac_jb = jnp.take_along_axis(frac, jb[:, None], axis=1)[:, 0]
        integral = frac_jb <= bin_tol

        better = conv & integral & (~pruned_conv) & (fval < s.inc_fval)
        bt = better[:, None]
        inc_fval = jnp.where(better, fval, s.inc_fval)
        inc_lam = jnp.where(bt, lam, s.inc_lam)
        inc_active = jnp.where(bt, act | cur_fixed, s.inc_active)
        inc_side = jnp.where(bt, jnp.where(cur_fixed, cur_fside, side),
                             s.inc_side)
        inc_found = s.inc_found | better

        # ---- branch: push the far child (parent-warm), continue the
        # near child in place
        branch = conv & (~pruned_conv) & (~integral)
        onehot = jnp.arange(m)[None, :] == jb[:, None]
        child_fixed = cur_fixed | onehot
        su_jb = jnp.take_along_axis(slack_up, jb[:, None], axis=1)[:, 0]
        sl_jb = jnp.take_along_axis(slack_lo, jb[:, None], axis=1)[:, 0]
        near_up = (su_jb <= sl_jb)[:, None]
        far_side = jnp.where(onehot, ~near_up, cur_fside)
        far_viable = jnp.where(near_up[:, 0], lo_f[jb], up_f[jb])
        w_side_far = jnp.where(onehot, ~near_up, side)

        if best_first:
            free = ~occ
            has_free = jnp.any(free, axis=1)
            ix = jnp.argmax(free, axis=1).astype(jnp.int32)
            do_push = branch & far_viable & has_free
            push_capped = branch & far_viable & ~has_free
            occ = occ.at[bidx, ix].set(
                jnp.where(do_push, True, occ[bidx, ix]))
        else:
            ix = jnp.minimum(top, cap - 1)
            do_push = branch & far_viable & (top < cap)
            push_capped = branch & far_viable & (top >= cap)
        top = top + do_push.astype(jnp.int32)
        dom = do_push[:, None]
        put = lambda A, v: A.at[bidx, ix].set(jnp.where(dom, v, A[bidx, ix]))
        stack_fixed = put(s.stack_fixed, child_fixed)
        stack_side = put(s.stack_side, far_side)
        stack_lam = put(s.stack_lam, lam)
        stack_act = put(s.stack_act, act)
        stack_ws = put(s.stack_ws, w_side_far)
        stack_bound = s.stack_bound.at[bidx, ix].set(
            jnp.where(do_push, fval, s.stack_bound[bidx, ix]))
        if fast_nodes:
            # far child inherits the parent's inverse, stored in f32 (the
            # memory-dominant stack leg; the pop-side Woodbury-add's NS
            # pass contracts the f32 rounding, and the drift certificate
            # backstops it)
            stack_R = s.stack_R.at[bidx, ix].set(jnp.where(
                do_push[:, None, None], R.astype(jnp.float32),
                s.stack_R[bidx, ix]))
        else:
            stack_R = s.stack_R

        bm = branch[:, None]
        cur_fixed = jnp.where(bm, child_fixed, cur_fixed)
        cur_fside = jnp.where(bm & onehot, near_up, cur_fside)
        # the near child's fixed row joins the working set at its bound
        add_row = bm & onehot & ~act
        act = jnp.where(bm & onehot, True, act)
        side = jnp.where(bm & onehot, near_up, side)
        nodes = nodes + branch.astype(jnp.int32)
        node_iter = jnp.where(branch, 0, node_iter)

        finished = (conv & (integral | pruned_conv)) | nfail
        active = (active & ~finished) | branch
        exhausted = s.exhausted | nfail
        capped = s.capped | nfail_cap | push_capped

        if fast_nodes:
            R = wu_add(R, act, add_row, branch & jnp.any(add_row, axis=1))
            # drift certificate for the carried inverse: NS contracts
            # quadratically while ||I - M R|| < 1, but a DEGENERATE
            # Woodbury update (near-singular rank-2 Schur complement on
            # these massively dual-degenerate working sets) can leave R
            # garbage -- measured on the m=88 contact tree, walking on
            # with it takes ~2.7x the iterations of the exact-solve
            # scheme (47 vs 17 per node; same 415-node tree). The
            # in-loop staleness gate freezes such lanes mid-round; here
            # they (and any lane whose end-of-round residual is garbage-
            # level -- the threshold must stay ABOVE the eps*cond ~ 1e-4
            # floor of fresh factorizations on degenerate sets, or
            # reseeding loops forever) get a real factorization under
            # lax.cond, paid only on rounds where a lane degraded
            # (reseed counts surface in the bench stats).
            MR = jnp.einsum("bij,bjk->bik", masked_M(act.astype(dtype)), R,
                            precision=PREC)
            err = jnp.max(jnp.abs(MR - eye_m[None]), axis=(1, 2))
            bad = active & (stale_l | (err > drift_tol))
            R = jax.lax.cond(
                jnp.any(bad),
                lambda R: jnp.where(bad[:, None, None],
                                    jax.vmap(seed_R)(act), R),
                lambda R: R, R)
            reseeds = s.reseeds + bad.astype(jnp.int32)
        else:
            reseeds = s.reseeds

        new = ChunkState(
            stack_fixed=stack_fixed, stack_side=stack_side,
            stack_lam=stack_lam, stack_act=stack_act, stack_ws=stack_ws,
            stack_bound=stack_bound, stack_R=stack_R, occ=occ, top=top,
            cur_fixed=cur_fixed, cur_fside=cur_fside, lam=lam, act=act,
            side=side, R=R, node_iter=node_iter, active_node=active,
            inc_fval=inc_fval, inc_lam=inc_lam, inc_active=inc_active,
            inc_side=inc_side, inc_found=inc_found, nodes=nodes,
            iters=iters, exhausted=exhausted, capped=capped,
            reseeds=reseeds,
        )
        any_active = jnp.any(active | ((top > 0) & (nodes < node_limit)))
        return new, any_active

    step_jit = jax.jit(step, donate_argnums=0)

    def finalize(thetas, s: ChunkState):
        B = thetas.shape[0]
        n = arrays.u_off.shape[0]
        # 1 = proven optimal; 2 = exact incumbent, TRULY budget-limited
        # search (cap-hit / node limit / stack overflow). Residual-fail
        # prunes keep only driving the -1/-2 split via `exhausted`.
        budgeted = s.capped | (s.nodes >= node_limit)
        status = jnp.where(
            s.inc_found,
            jnp.where(budgeted, jnp.int32(2), jnp.int32(1)),
            jnp.where(s.exhausted | budgeted, jnp.int32(-1), jnp.int32(-2)))
        hi = arrays if arrays_hi is None else arrays_hi
        sol = jax.vmap(
            lambda t, a, sd: polish_solution(hi, t, a, sd,
                                             use_cholesky=use_cholesky)
        )(thetas, s.inc_active, s.inc_side)
        zero_U = jnp.zeros((B, n), sol.U.dtype)
        fm = s.inc_found[:, None]
        return Solution(
            jnp.where(fm, sol.U, zero_U),
            jnp.where(fm, sol.lam, jnp.zeros((B, m), sol.lam.dtype)),
            s.inc_active, s.inc_side,
            jnp.where(s.inc_found, sol.fval, big),
            s.iters, status,
        )

    finalize_jit = jax.jit(finalize)

    @jax.jit
    def prep(thetas):
        th = thetas.astype(dtype)
        du_t = arrays.du + jnp.dot(th, arrays.Dth.T, precision=PREC)
        dl_t = arrays.dl + jnp.dot(th, arrays.Dth.T, precision=PREC)
        U0 = arrays.u_off + jnp.dot(th, arrays.Uth_off.T, precision=PREC)
        f_t = arrays.f + jnp.dot(th, arrays.f_theta.T, precision=PREC)
        return du_t, dl_t, U0, f_t

    def solve(thetas, max_rounds: int | None = None):
        import os as _os

        thetas = jnp.asarray(thetas)
        B = thetas.shape[0]
        du_t, dl_t, U0, f_t = prep(thetas)
        act0 = jnp.broadcast_to(is_eq, (B, m))
        # the f32 inverse stack is the memory-dominant leg (B*cap*m^2*4
        # bytes); clamp the slot count to an HBM budget -- an overflowed
        # push marks the lane `capped` (status 2), never a silent drop
        cap_eff = stack_cap
        if fast_nodes:
            budget = int(_os.environ.get(
                "LINEARMPC_TPU_BNB_STACKR_MB", "1024")) * 2**20
            cap_eff = max(4, min(stack_cap, budget // max(1, B * m * m * 4)))
            R0 = jax.jit(jax.vmap(seed_R))(act0)
            stack_R0 = jnp.zeros((B, cap_eff, m, m), jnp.float32)
        else:
            R0 = jnp.zeros((B, 1, 1), dtype)
            stack_R0 = jnp.zeros((B, 1, 1, 1), jnp.float32)
        s = ChunkState(
            stack_fixed=jnp.zeros((B, cap_eff, m), bool),
            stack_side=jnp.zeros((B, cap_eff, m), bool),
            stack_lam=jnp.zeros((B, cap_eff, m), dtype),
            stack_act=jnp.zeros((B, cap_eff, m), bool),
            stack_ws=jnp.ones((B, cap_eff, m), bool),
            stack_bound=jnp.full((B, cap_eff), -big, dtype),
            stack_R=stack_R0,
            occ=jnp.zeros((B, cap_eff if best_first else 1), bool),
            top=jnp.zeros(B, jnp.int32),
            cur_fixed=jnp.zeros((B, m), bool),
            cur_fside=jnp.zeros((B, m), bool),
            lam=jnp.zeros((B, m), dtype),
            act=act0,
            side=jnp.ones((B, m), bool),
            R=R0,
            node_iter=jnp.zeros(B, jnp.int32),
            active_node=jnp.ones(B, bool),  # the root node
            inc_fval=jnp.full(B, big, dtype),
            inc_lam=jnp.zeros((B, m), dtype),
            inc_active=jnp.zeros((B, m), bool),
            inc_side=jnp.zeros((B, m), bool),
            inc_found=jnp.zeros(B, bool),
            nodes=jnp.ones(B, jnp.int32),
            iters=jnp.zeros(B, jnp.int32),
            exhausted=jnp.zeros(B, bool),
            capped=jnp.zeros(B, bool),
            reseeds=jnp.zeros(B, jnp.int32),
        )
        # ceiling: every node can burn node_cap iterations in k_chunk slices
        cap_rounds = max_rounds or (
            node_limit * ((node_cap + k_chunk - 1) // k_chunk) + 8)
        r = 0
        while r < cap_rounds:
            budget = min(poll_every, cap_rounds - r)
            for _ in range(budget):
                s, any_active = step_jit(s, du_t, dl_t, U0, f_t)
            r += budget
            if not bool(any_active):  # blocks; ~25 ms under the tunnel
                break
        solve.last_state = s  # search statistics for profiling/bench
        solve.rounds = r
        return finalize_jit(thetas, s)

    return solve
