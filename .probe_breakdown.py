import time
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import linearmpc_tpu as lmpc
from linearmpc_tpu.ops.pallas_solver import phase1_pallas
from linearmpc_tpu.ops.ldp import precompute_subset_inverses
from linearmpc_tpu.ops.ds_polish import make_dsldp, polish_batch_ds
from linearmpc_tpu.ops.dual_active_set import finish_from_state

mpc, _ = lmpc.mpc_examples("invpend")
mpc.setup(dtype=jnp.float32)
e = mpc.engine
ldp = e.ldp
m = ldp.m
rng = np.random.default_rng(0)
B = 32768
K = 32
batches = [jnp.asarray(np.hstack([rng.uniform(-20,20,(B,4)), rng.uniform(-20,20,(B,2)), rng.uniform(-2,2,(B,1))]), jnp.float64) for _ in range(K)]
for b in batches: b.block_until_ready()

subset_inv = precompute_subset_inverses(ldp)
subset_flat = jnp.asarray(subset_inv.reshape(2**m, m*m).T, jnp.float32)
G32 = jnp.asarray(ldp.G, jnp.float32); Dth32 = jnp.asarray(ldp.Dth, jnp.float32)
du32 = jnp.asarray(ldp.du, jnp.float32); dl32 = jnp.asarray(ldp.dl, jnp.float32)
eqf = jnp.asarray(ldp.is_eq, jnp.float32); immutf = jnp.asarray(ldp.is_immutable, jnp.float32)
dsl = make_dsldp(ldp, subset_inv)

def mk_p1(iters):
    @jax.jit
    def p1(th64):
        th32 = th64.astype(jnp.float32)
        du_t = du32 + th32 @ Dth32.T; dl_t = dl32 + th32 @ Dth32.T
        lam0 = jnp.zeros((B, m), jnp.float32)
        act0 = jnp.broadcast_to(eqf > 0.5, (B, m)).astype(jnp.float32)
        side0 = jnp.ones((B, m), jnp.float32)
        return phase1_pallas(subset_flat, G32, du_t, dl_t, eqf, immutf, lam0, act0, side0,
            m=m, n_subsets=2**m, max_iter=iters, primal_tol=e.primal_tol, sign_tol=e.sign_tol)
    return p1

def chain_bench(name, fn, inputs):
    outs = [fn(b) for b in inputs[:2]]
    jax.tree_util.tree_leaves(outs[-1])[0].block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(b) for b in inputs]
        jax.tree_util.tree_leaves(outs[-1])[0].block_until_ready()
        best = min(best, (time.perf_counter()-t0)/len(inputs))
    print(f"{name}: {best*1e3:.2f} ms/batch -> {B/best:,.0f} solves/s", flush=True)
    return outs[0]

for it in (16, 32, 46):
    chain_bench(f"phase1 x{it}", mk_p1(it), batches)

p1f = mk_p1(46)
states = [p1f(b) for b in batches]
jax.tree_util.tree_leaves(states[-1])[0].block_until_ready()

@jax.jit
def tier1(th64, act, side):
    return polish_batch_ds(dsl, th64, act, side)
outs1 = None
def t1(i):
    lam, act, side, iters, done = states[i]
    return tier1(batches[i], act, side)
chain_bench("tier1 ds polish", t1, list(range(K)))

@jax.jit
def tier2(th64, lam, act, side, iters, bad):
    k = 256
    bad_top, idx = jax.lax.top_k(bad, k)
    fix = jax.vmap(lambda t, l0, a0, s0, it0: finish_from_state(
        e.arrays_hi, t, l0, a0, s0, it0, use_cholesky=True, max_iter=24,
    ))(th64[idx], lam[idx], act[idx], side[idx], iters[idx])
    return fix.U

polished = [t1(i) for i in range(K)]
jax.tree_util.tree_leaves(polished[-1])[0].block_until_ready()
def t2(i):
    lam, act, side, iters, done = states[i]
    U, lamds, fval, bad = polished[i]
    return tier2(batches[i], lam, act, side, iters, bad)
chain_bench("tier2 straggler f64", t2, list(range(K)))

chain_bench("FULL solve_batch", lambda b: e.solve_batch(b), batches)
