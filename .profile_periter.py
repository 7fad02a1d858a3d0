import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

import linearmpc_tpu as lmpc
from linearmpc_tpu.ops.ldp import precompute_subset_inverses
from linearmpc_tpu.ops.pallas_solver import phase1_pallas

mpc, _ = lmpc.mpc_examples("invpend")
mpc.setup(dtype=jnp.float32)
e = mpc.engine
ldp = e.ldp
m = ldp.m
rng = np.random.default_rng(0)
B = 32768
th = np.hstack([
    rng.uniform(-20, 20, (B, 4)), rng.uniform(-20, 20, (B, 2)), rng.uniform(-2, 2, (B, 1)),
])
th32 = jnp.asarray(th, jnp.float32)

subset_inv = precompute_subset_inverses(ldp)
subset_flat = jnp.asarray(subset_inv.reshape(2**m, m * m).T, jnp.float32)
subset_tbl = jnp.asarray(subset_inv, jnp.float32)  # (2^m, m, m)
G32 = jnp.asarray(ldp.G, jnp.float32)
Dth32 = jnp.asarray(ldp.Dth, jnp.float32)
du32 = jnp.asarray(ldp.du, jnp.float32)
dl32 = jnp.asarray(ldp.dl, jnp.float32)
eqf = jnp.asarray(ldp.is_eq, jnp.float32)
immutf = jnp.asarray(ldp.is_immutable, jnp.float32)
eqb = jnp.asarray(ldp.is_eq)
immutb = jnp.asarray(ldp.is_immutable)
pow2 = jnp.asarray(2 ** np.arange(m), jnp.int32)


def bench(name, fn, *a):
    out = fn(*a)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"{name}: min {min(ts)*1e3:.2f} ms  median {np.median(ts)*1e3:.2f} ms", flush=True)
    return out


def mk_p1(iters):
    @jax.jit
    def p1(th32):
        du_t = du32 + th32 @ Dth32.T
        dl_t = dl32 + th32 @ Dth32.T
        lam0 = jnp.zeros((B, m), jnp.float32)
        act0 = jnp.broadcast_to(eqf > 0.5, (B, m)).astype(jnp.float32)
        side0 = jnp.ones((B, m), jnp.float32)
        return phase1_pallas(
            subset_flat, G32, du_t, dl_t, eqf, immutf, lam0, act0, side0,
            m=m, n_subsets=2**m, max_iter=iters,
            primal_tol=e.primal_tol, sign_tol=e.sign_tol,
        )
    return p1


for iters in (2, 10, 46):
    bench(f"pallas phase1 max_iter={iters}", mk_p1(iters), th32)


# pure-XLA batch-major equivalent of the same iteration, lax.scan outside
def xla_iteration(carry, _):
    lam, act, side, done = carry  # (B, m) f32/bool
    actf = act.astype(jnp.float32)
    du_t, dl_t = xla_iteration.du_t, xla_iteration.dl_t
    d_side = jnp.where(side, du_t, dl_t)
    rhs = -actf * d_side
    mask_id = jnp.sum(jnp.where(act, pow2, 0), axis=-1)  # (B,)
    inv = subset_tbl[mask_id]                            # (B, m, m) gather
    lam_star = jnp.einsum("bij,bj->bi", inv, rhs)

    sign_viol = act & ~eqb & jnp.where(side, lam_star < -e.sign_tol, lam_star > e.sign_tol)
    has_viol = jnp.any(sign_viol, axis=-1, keepdims=True)

    denom = lam - lam_star
    safe = jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
    big = jnp.float32(3e38)
    alpha_i = jnp.where(sign_viol, lam / safe, big)
    alpha_min = jnp.min(alpha_i, axis=-1, keepdims=True)
    is_jb = (alpha_i <= alpha_min) & sign_viol
    # first-hit mask
    csum = jnp.cumsum(is_jb.astype(jnp.float32), axis=-1)
    is_jb = is_jb & (csum <= 1.0)
    alpha = jnp.clip(alpha_min, 0.0, 1.0)
    lam_B = jnp.where(is_jb, 0.0, lam + alpha * (lam_star - lam))
    act_B = act & ~is_jb

    c = lam_star @ G32.T
    cand = ~act & ~immutb
    v_up = jnp.where(cand, -(du_t + c), -big)
    v_lo = jnp.where(cand, dl_t + c, -big)
    v = jnp.maximum(v_up, v_lo)
    vmax = jnp.max(v, axis=-1, keepdims=True)
    conv = vmax <= e.primal_tol
    is_j = (v >= vmax)
    csum2 = jnp.cumsum(is_j.astype(jnp.float32), axis=-1)
    is_j = is_j & (csum2 <= 1.0)
    grow = is_j & ~conv
    act_A = act | grow
    side_A = jnp.where(grow, v_up >= v_lo, side)
    lam_A = jnp.where(act_A, lam_star, 0.0)

    new_lam = jnp.where(has_viol, lam_B, lam_A)
    new_act = jnp.where(has_viol, act_B, act_A)
    new_side = jnp.where(has_viol, side, side_A)
    new_done = done | (~has_viol[:, 0] & conv[:, 0])

    keep = done[:, None]
    lam = jnp.where(keep, lam, new_lam)
    act = jnp.where(keep, act, new_act)
    side = jnp.where(keep, side, new_side)
    return (lam, act, side, new_done), None


def mk_xla(iters):
    @jax.jit
    def px(th32):
        du_t = du32 + th32 @ Dth32.T
        dl_t = dl32 + th32 @ Dth32.T
        xla_iteration.du_t = du_t
        xla_iteration.dl_t = dl_t
        lam0 = jnp.zeros((B, m), jnp.float32)
        act0 = jnp.broadcast_to(eqb, (B, m))
        side0 = jnp.ones((B, m), bool)
        done0 = jnp.zeros((B,), bool)
        (lam, act, side, done), _ = jax.lax.scan(
            xla_iteration, (lam0, act0, side0, done0), None, length=iters
        )
        return lam, act, side, done
    return px


for iters in (2, 10, 46):
    out = bench(f"XLA scan phase1 max_iter={iters}", mk_xla(iters), th32)
print("XLA done frac at 46:", float(jnp.mean(out[3])), flush=True)
