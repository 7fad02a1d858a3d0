"""Sequential lexicographic hierarchy for prioritized soft constraints.

The reference resolves constraint priorities through DAQP's break_points
hierarchy (src/mpc2mpqp.jl:859-899): priority levels are satisfied in
order -- a lower-priority constraint may not increase the violation of any
higher-priority one. The framework's default ("proximal") mode approximates
this in a single solve with geometrically separated soft weights
(ops/ldp.py); this module implements the exact sequential semantics
(``settings.hierarchy = "lexicographic"``):

  for each priority level, highest first:
    * soft rows of this level carry the soft weight (proximal rho);
    * soft rows of HIGHER levels are held HARD at their bounds relaxed by
      exactly the violation recorded when their level was solved;
    * soft rows of LOWER levels are ignored (immutable);
    * hard rows are always enforced.
  the last level's solution is returned.

Each level is one batched dual active-set solve in float64 (the masked-
Cholesky loop); violations are read off the LDP slacks, where a soft row
active at a bound violates it by exactly rho * |lambda|.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .dual_active_set import (
    LDPArrays,
    Solution,
    _active_set_loop,
    to_device_arrays,
)
from .ldp import LDPData


class LexSolver:
    """Host-built sequence of per-level solver arrays + a jitted batched
    sequential solve. Requires >= 2 priority levels among soft rows."""

    def __init__(self, ldp: LDPData, *, soft_weight: float = 1e6,
                 iter_limit: int = 1000, primal_tol: float = 1e-6,
                 sign_tol: float = 1e-11, margin: float = 1e-9):
        if ldp.prio is None:
            raise ValueError("LDPData carries no priorities")
        soft = np.asarray(ldp.is_soft)
        self.levels = [int(p) for p in np.unique(np.asarray(ldp.prio)[soft])]
        if len(self.levels) < 2:
            raise ValueError("lexicographic mode needs >= 2 priority levels")
        self.ldp = ldp
        self.iter_limit = int(iter_limit)
        self.primal_tol = float(primal_tol)
        self.sign_tol = float(sign_tol)
        self.margin = float(margin)

        base = to_device_arrays(ldp, jnp.float64)
        G = np.asarray(ldp.G)
        m = ldp.m
        rho_val = 1.0 / float(soft_weight)
        self.level_arrays: list[tuple[LDPArrays, jax.Array]] = []
        prio = np.asarray(ldp.prio)
        from .ldp import SUBSET_CACHE_MAX_M, precompute_subset_inverses

        for lvl in self.levels:
            mask = soft & (prio == lvl)
            later = soft & (prio > lvl)
            G_solve = jnp.asarray(G + np.diag(np.where(mask, rho_val, 0.0)))
            immut = jnp.asarray(np.asarray(ldp.is_immutable) | later)
            # per-level working-set inverse cache (each level has its own
            # soft diagonal, hence its own cache): collapses the level's
            # masked KKT solves to a gather + matvec for small m
            subset = None
            if 0 < m <= SUBSET_CACHE_MAX_M:
                import dataclasses

                ldp_lvl = dataclasses.replace(
                    ldp, rho_soft=np.where(mask, rho_val, 0.0))
                subset = jnp.asarray(precompute_subset_inverses(ldp_lvl))
            arrays = base._replace(G_solve=G_solve, is_immutable=immut,
                                   subset_inv=subset)
            self.level_arrays.append((arrays, jnp.asarray(mask)))
        self.base = base
        self._batched = jax.jit(self._solve_batch_impl)

    def _solve_batch_impl(self, thetas: jax.Array) -> Solution:
        base = self.base
        m = base.G.shape[0]
        th = thetas.astype(jnp.float64)
        du_t = base.du + th @ base.Dth.T
        dl_t = base.dl + th @ base.Dth.T
        B = th.shape[0]
        off_u = jnp.zeros((B, m))
        off_l = jnp.zeros((B, m))
        all_done = jnp.ones(B, dtype=bool)
        iters = jnp.zeros(B, jnp.int32)
        lam = jnp.zeros((B, m))
        # per-level warm starts: the previous level differs only in the
        # soft diagonal, the un-frozen rows, and the violation offsets, so
        # its multipliers/working set are a few active-set changes away
        # (DAQP reuses its workspace across hierarchy levels the same way)
        act_w = jnp.broadcast_to(self.base.is_eq, (B, m))
        side_w = jnp.ones((B, m), dtype=bool)

        for arrays, mask in self.level_arrays:
            def level_solve(dut, dlt, l0, a0, s0, arrays=arrays):
                return _active_set_loop(
                    arrays, dut, dlt, arrays.is_eq, arrays.is_immutable,
                    l0, a0 | arrays.is_eq, s0,
                    max_iter=self.iter_limit, primal_tol=self.primal_tol,
                    sign_tol=self.sign_tol, use_cholesky=True,
                )

            final = jax.vmap(level_solve)(du_t + off_u, dl_t - off_l,
                                          lam, act_w, side_w)
            lam, act_w, side_w = final.lam, final.active, final.side
            all_done = all_done & final.done
            iters = iters + final.iters
            c = lam @ base.G.T
            viol_u = jnp.maximum(-(du_t + off_u + c), 0.0)
            viol_l = jnp.maximum(dl_t - off_l + c, 0.0)
            # freeze this level's achieved violations: relax its rows'
            # bounds by exactly the violation (plus a roundoff margin) so
            # the next level holds them hard without infeasibility
            off_u = off_u + jnp.where(mask, viol_u + self.margin, 0.0)
            off_l = off_l + jnp.where(mask, viol_l + self.margin, 0.0)

        U = base.u_off + th @ base.Uth_off.T - lam @ base.HinvET.T
        f_t = base.f + th @ base.f_theta.T
        fval = 0.5 * jnp.einsum("bi,ij,bj->b", U, base.H, U) + jnp.sum(f_t * U, axis=1)
        # the last level's working set / side are reported
        status = jnp.where(all_done, jnp.int32(1), jnp.int32(-1))
        return Solution(U, lam, lam != 0.0, lam > 0.0, fval, iters, status)

    def solve_batch(self, thetas) -> Solution:
        return self._batched(jnp.asarray(thetas, jnp.float64))

    def solve(self, theta):
        sol = self.solve_batch(jnp.asarray(theta, jnp.float64)[None])
        return jax.tree_util.tree_map(lambda a: a[0], sol)
