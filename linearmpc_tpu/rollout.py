"""Fused batched closed-loop rollout: the TPU production path.

The reference's serial simulation loop (src/simulation.jl:93-113) becomes a
``lax.scan`` over time with every per-step stage fused into one jitted
program -- measure, Kalman correct, parameter assembly, warm-started dual
active-set solve, Kalman predict, plant step -- and ``vmap``ed over
thousands of scenario lanes per chip (SURVEY.md section 2.3 data-parallel
plan). Warm starts carry the working set between steps, matching DAQP's
warm-start semantics (reference codegen DAQP_WARMSTART,
src/codegen.jl:167-169).

Supported here: the standard non-preview parameter layout
theta = [x; r; d; u_prev] with optional steady-state Kalman filter.
Preview layouts fall back to the host loop (simulation.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops.dual_active_set import solve_single


class RolloutResult(NamedTuple):
    xs: jax.Array      # (B, N, nx) plant states
    us: jax.Array      # (B, N, nu) applied controls
    ys: jax.Array      # (B, N, ny) outputs
    iters: jax.Array   # (B, N) solver iterations per step
    status: jax.Array  # (B, N)


def build_rollout(mpc, *, plant=None, use_observer=None, polish=None):
    """Compile a batched closed-loop rollout for ``mpc``.

    Returns ``rollout(x0s, rs, ds, N) -> RolloutResult`` where
      * ``x0s``: (B, nx) initial states
      * ``rs``:  (B, nr) constant references per lane (or None)
      * ``ds``:  (B, N, nd) measured disturbances (or None)
    ``N`` is static (baked into the scan length at first call).

    ``plant``: optional (F, G, f_offset)-triple overriding the simulated
    plant (defaults to the controller model, like ``scenario.dynamics``).
    """
    if not mpc.mpqp_issetup:
        mpc.setup()
    if mpc.settings.reference_preview or mpc.settings.disturbance_preview or mpc.settings.parameter_preview:
        raise NotImplementedError("preview layouts use the host simulation loop")

    engine = mpc.engine
    arrays = engine.arrays
    arrays_hi = engine.arrays_hi if (polish is None or polish) else None
    kw = dict(engine._solve_kw)
    dtype = engine.dtype

    model = mpc.model
    nx, nu, ny, nd_model = model.nx, model.nu, model.ny, model.nd
    nx_, nr, nd, nuprev, np_ = mpc.get_parameter_dims()
    if np_ > 0:
        raise NotImplementedError("generalized parameters in rollout: pass p through theta manually")

    c = lambda a: jnp.asarray(np.asarray(a, dtype=np.float64), dtype=dtype)
    if plant is None:
        Fp, Gp, fp = c(model.F), c(model.G), c(model.f_offset)
    else:
        Fp, Gp, fp = (c(a) for a in plant)
    Gd = c(model.Gd)
    C = c(model.C)
    Dd = c(model.Dd)
    h_off = c(model.h_offset)
    K = c(mpc.K)

    obs = mpc.state_observer
    has_obs = obs is not None if use_observer is None else bool(use_observer)
    if has_obs and hasattr(obs, "estimator"):
        raise NotImplementedError("offset-free observers use the host simulation loop")
    if has_obs:
        est = obs
        oF, oG, oGd = c(est.F), c(est.G), c(est.Gd)
        oC, oDd, oh = c(est.C), c(est.Dd), c(est.h_offset)
        of = c(est.f_offset)
        oK = c(est.K)
        nxo = est.F.shape[0]
    else:
        nxo = 0

    m = arrays.G.shape[0]

    def step(carry, inp):
        x, xo, uprev, lam, act, side = carry
        r_k, d_k = inp

        # measure
        y_m = x @ C.T + h_off + (d_k @ Dd.T if nd_model else 0.0)

        if has_obs:
            inov = y_m - xo @ oC.T - oh - (d_k @ oDd.T if nd_model else 0.0)
            xo = xo + inov @ oK.T
            xhat = xo[:, :nx]
        else:
            xhat = x

        parts = [xhat]
        if nr:
            parts.append(r_k)
        if nd:
            parts.append(d_k)
        if nuprev:
            parts.append(uprev[:, :nuprev])
        theta = jnp.concatenate(parts, axis=1)

        sol = jax.vmap(
            lambda th, l0, a0, s0: solve_single(arrays, th, l0, a0, s0, ldp_hi=arrays_hi, **kw)
        )(theta, lam, act, side)
        u = sol.U[:, :nu].astype(dtype) - xhat @ K.T

        if has_obs:
            xo = xo @ oF.T + u @ oG.T + of + (d_k @ oGd.T if nd_model else 0.0)

        x_next = x @ Fp.T + u @ Gp.T + fp + (d_k @ Gd.T if nd_model else 0.0)
        carry = (x_next, xo, u, sol.lam.astype(dtype), sol.active, sol.side)
        return carry, (x, u, y_m, sol.iters, sol.status)

    def rollout(x0s, rs=None, ds=None, N: int = 100):
        B = x0s.shape[0]
        x0s = jnp.asarray(x0s, dtype)
        rs = jnp.zeros((B, nr), dtype) if (rs is None or nr == 0) else jnp.asarray(rs, dtype)
        if ds is None or nd_model == 0:
            ds = jnp.zeros((N, B, nd_model), dtype)
        else:
            ds = jnp.moveaxis(jnp.asarray(ds, dtype), 1, 0)  # (B,N,nd) -> (N,B,nd)
        rs_t = jnp.broadcast_to(rs, (N,) + rs.shape)

        xo0 = jnp.zeros((B, nxo), dtype)
        if has_obs:
            xo0 = xo0.at[:, :nx].set(x0s)
        carry0 = (
            x0s, xo0, jnp.zeros((B, nu), dtype),
            jnp.zeros((B, m), dtype), jnp.zeros((B, m), dtype=bool), jnp.ones((B, m), dtype=bool),
        )
        carry, (xs, us, ys, iters, status) = jax.lax.scan(step, carry0, (rs_t, ds))
        return RolloutResult(
            jnp.moveaxis(xs, 0, 1), jnp.moveaxis(us, 0, 1), jnp.moveaxis(ys, 0, 1),
            jnp.moveaxis(iters, 0, 1), jnp.moveaxis(status, 0, 1),
        )

    return jax.jit(rollout, static_argnames=("N",))
