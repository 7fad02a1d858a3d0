import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

import linearmpc_tpu as lmpc
from linearmpc_tpu.ops.ds_polish import polish_batch_ds
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
th64 = jnp.asarray(th, jnp.float64)

from linearmpc_tpu.ops.ldp import precompute_subset_inverses

subset_inv = precompute_subset_inverses(ldp)
subset_flat = jnp.asarray(subset_inv.reshape(2**m, m * m).T, jnp.float32)
G32 = jnp.asarray(ldp.G, jnp.float32)
Dth32 = jnp.asarray(ldp.Dth, jnp.float32)
du32 = jnp.asarray(ldp.du, jnp.float32)
dl32 = jnp.asarray(ldp.dl, jnp.float32)
eqf = jnp.asarray(ldp.is_eq, jnp.float32)
immutf = jnp.asarray(ldp.is_immutable, jnp.float32)
bulk_cap = min(e.iter_limit, 2 * m + 36)

@jax.jit
def p1(th64):
    th32 = th64.astype(jnp.float32)
    du_t = du32 + th32 @ Dth32.T
    dl_t = dl32 + th32 @ Dth32.T
    lam0 = jnp.zeros((B, m), jnp.float32)
    act0 = jnp.broadcast_to(eqf > 0.5, (B, m)).astype(jnp.float32)
    side0 = jnp.ones((B, m), jnp.float32)
    return phase1_pallas(
        subset_flat, G32, du_t, dl_t, eqf, immutf, lam0, act0, side0,
        m=m, n_subsets=2**m, max_iter=bulk_cap,
        primal_tol=e.primal_tol, sign_tol=e.sign_tol,
    )

from linearmpc_tpu.ops.ds_polish import make_dsldp

dsl = make_dsldp(ldp, subset_inv)

@jax.jit
def p2(th64, act, side):
    return polish_batch_ds(dsl, th64, act, side)

def timeit(name, fn, *a):
    out = fn(*a)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"{name}: min {min(ts)*1e3:.2f} ms  mean {np.mean(ts)*1e3:.2f} ms", flush=True)
    return out

lam, act, side, iters, done = timeit("phase1 (pallas scan x%d)" % bulk_cap, p1, th64)
print("phase1 done frac:", float(jnp.mean(done)), flush=True)
U, lamds, fval, bad = timeit("tier1 ds polish", p2, th64, act, side)
print("bad>1e-8 frac:", float(jnp.mean(bad > 1e-8)), "max bad:", float(jnp.max(bad)), flush=True)
timeit("full solve_batch", lambda t: e.solve_batch(t).U, th64)

# straggler tier alone
from linearmpc_tpu.ops.dual_active_set import finish_from_state

idx = jax.lax.top_k(bad, 256)[1]

@jax.jit
def p3(th64, lam, act, side, iters, idx):
    return jax.vmap(
        lambda t, l0, a0, s0, it0: finish_from_state(
            e.arrays_hi, t, l0, a0, s0, it0, use_cholesky=True, max_iter=24,
        )
    )(th64[idx], lam[idx], act[idx], side[idx], iters[idx]).U

timeit("tier2 straggler f64 (K=256)", p3, th64, lam, act, side, iters, idx)
