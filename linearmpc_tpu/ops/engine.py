"""Solver engine: jitted entry points around the batched dual active-set core.

Plays the role of the reference's DAQP workspace (``opt_model``,
src/setup.jl:11-26 + src/utils.jl:268-283): holds the lowered LDP arrays on
device, jit-compiles the solve paths once, and exposes host-friendly
single-instance and batched entry points (plus branch-and-bound for hybrid
problems).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .dual_active_set import LDPArrays, Solution, solve_batch, solve_single, to_device_arrays
from .ldp import LDPData


def default_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


class SolverEngine:
    def __init__(
        self,
        ldp: LDPData,
        *,
        dtype=None,
        iter_limit: int = 1000,
        primal_tol: float = 1e-6,
        sign_tol: float = 1e-12,
        has_binaries: bool = False,
        bnb_node_limit: int = 4096,
        symmetric: bool = True,
        polish: bool | None = None,
    ):
        self.ldp = ldp
        self.dtype = default_dtype() if dtype is None else dtype
        # working-set inverse cache: collapses each iteration's KKT solve to
        # a gather + matvec for small m (see ops/ldp.py)
        from .ldp import SUBSET_CACHE_MAX_M, precompute_subset_inverses

        subset_inv = None
        if ldp.m <= SUBSET_CACHE_MAX_M and ldp.m > 0:
            subset_inv = precompute_subset_inverses(ldp)
        self._subset_inv = subset_inv
        self.arrays: LDPArrays = to_device_arrays(ldp, self.dtype, subset_inv)
        self.iter_limit = int(iter_limit)
        # tolerances must sit above the iteration dtype's noise floor or
        # marginal multipliers flip sign forever (add/remove cycling); the
        # f64 polish restores full accuracy afterwards
        if self.dtype == jnp.float32:
            primal_tol = max(primal_tol, 2e-5)
            sign_tol = max(sign_tol, 1e-6)
        self.primal_tol = float(primal_tol)
        self.sign_tol = float(sign_tol)
        self.has_binaries = bool(has_binaries)
        self.bnb_node_limit = int(bnb_node_limit)
        self.symmetric = bool(symmetric)
        # float32 iterations + float64 active-set polish by default on
        # reduced-precision paths (TPU); float64 paths need no polish
        self.polish = (self.dtype != jnp.float64) if polish is None else bool(polish)
        self.arrays_hi = to_device_arrays(ldp, jnp.float64, subset_inv) if self.polish else None

        kw = dict(
            max_iter=self.iter_limit, primal_tol=self.primal_tol, sign_tol=self.sign_tol,
            use_cholesky=self.symmetric,
        )
        self._solve_kw = kw

        def _single(arrays, hi, theta):
            return solve_single(arrays, theta, ldp_hi=hi, **kw)

        def _batched(arrays, hi, thetas, lam0=None, act0=None, side0=None):
            if lam0 is None:
                return jax.vmap(lambda th: solve_single(arrays, th, ldp_hi=hi, **kw))(thetas)
            return jax.vmap(
                lambda th, l0, a0, s0: solve_single(arrays, th, l0, a0, s0, ldp_hi=hi, **kw)
            )(thetas, lam0, act0, side0)

        self._single = jax.jit(_single)
        self._batched = jax.jit(_batched)

        if self.has_binaries:
            from .bnb import solve_bnb_single
            from .dual_active_set import polish_solution

            nb = int(np.sum(ldp.is_binary))
            stack_cap = max(2 * nb + 2, 4)
            bnb_kw = dict(stack_cap=stack_cap, node_limit=self.bnb_node_limit, **kw)

            def _bnb(arrays, hi, theta):
                sol = solve_bnb_single(arrays, theta, **bnb_kw)
                if hi is None:
                    return sol
                return polish_solution(
                    hi, theta, sol.active, sol.side,
                    use_cholesky=self.symmetric, iters=sol.iters, status=sol.status,
                )

            self._bnb = jax.jit(_bnb)
            self._bnb_batched = jax.jit(
                lambda arrays, hi, thetas: jax.vmap(lambda th: _bnb(arrays, hi, th))(thetas)
            )

    # -- host-facing single solve (reference solve(), src/utils.jl:268-283)
    def solve(self, theta) -> tuple[np.ndarray, float, int, dict]:
        in_dtype = jnp.float64 if self.polish else self.dtype
        theta = jnp.asarray(np.asarray(theta, dtype=np.float64), dtype=in_dtype)
        if self.has_binaries:
            sol: Solution = self._bnb(self.arrays, self.arrays_hi, theta)
        else:
            sol = self._single(self.arrays, self.arrays_hi, theta)
        status = int(sol.status)
        info = {
            "iterations": int(sol.iters),
            "lam": np.asarray(sol.lam),
            "active": np.asarray(sol.active),
            "side": np.asarray(sol.side),
        }
        return np.asarray(sol.U, dtype=np.float64), float(sol.fval), status, info

    # -- device-facing batched solve
    def solve_batch(self, thetas, warm=None) -> Solution:
        # keep theta at full precision when polishing (downcast happens
        # inside the bulk phase only)
        in_dtype = jnp.float64 if self.polish else self.dtype
        thetas = jnp.asarray(thetas, dtype=in_dtype)
        if self.has_binaries:
            return self._bnb_batched(self.arrays, self.arrays_hi, thetas)
        if warm is None:
            return self._batched(self.arrays, self.arrays_hi, thetas)
        lam0, act0, side0 = warm
        return self._batched(self.arrays, self.arrays_hi, thetas, lam0, act0, side0)
