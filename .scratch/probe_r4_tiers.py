"""Per-tier timing at m=256 on TPU: bulk kernel, Richardson, second
chance, f64 guard. Also straggler counts after each stage."""
import sys, time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

import linearmpc_tpu as lmpc


def log(*a):
    print(*a, file=sys.stderr, flush=True)


mpc, _ = lmpc.mpc_examples("invpend", 63, 8)
mpc.add_constraint(Ax=np.eye(4), lb=-18 * np.ones(4), ub=18 * np.ones(4),
                   ks=range(2, 64))
mpc.setup(dtype=jnp.float32)
e = mpc.engine
log(f"m={e.ldp.m} s_max={e.ciu_s_max} s2={e._ciu_s2} cap_p env default")
rng = np.random.default_rng(99)
B = 8192
ths = np.hstack([
    rng.uniform(-8, 8, (B, 4)), rng.uniform(-8, 8, (B, 2)),
    rng.uniform(-2, 2, (B, 1)),
])
arr = e.arrays
P = jax.lax.Precision.HIGHEST
th32 = jnp.asarray(ths, jnp.float32)


@jax.jit
def duldl(th32):
    du_t = arr.du + jnp.dot(th32, arr.Dth.T, precision=P)
    dl_t = arr.dl + jnp.dot(th32, arr.Dth.T, precision=P)
    return du_t, dl_t


du_t, dl_t = duldl(th32)
du_t.block_until_ready()

bulk = jax.jit(e._ciu_bulk_pallas, static_argnums=())
out = bulk(arr, du_t, dl_t)
out[0].block_until_ready()
t0 = time.perf_counter()
out = bulk(arr, du_t, dl_t)
out[0].block_until_ready()
t_bulk = time.perf_counter() - t0
lam32, act, side, iters, infeas, ovf, SEL, Rw = out
it = np.asarray(iters)
log(f"bulk: {t_bulk*1e3:.1f} ms; iters p50={np.percentile(it,50):.0f} "
    f"p99={np.percentile(it,99):.0f} max={it.max()} "
    f"capped={np.mean(it >= 71):.4f} infeas={np.mean(np.asarray(infeas)):.4f} "
    f"ovf={np.mean(np.asarray(ovf)):.4f}")

# Richardson alone
hi = e.arrays_hi
f64 = jnp.float64


@jax.jit
def rich(SEL, Rw, act, side, th):
    th64 = th.astype(f64)
    du_h = hi.du + th64 @ hi.Dth.T
    dl_h = hi.dl + th64 @ hi.Dth.T
    actf = act.astype(f64)
    actf32 = act.astype(jnp.float32)
    rhs = -actf * jnp.where(side, du_h, dl_h)

    def applyR(v):
        v32 = v.astype(jnp.float32)
        w = jnp.einsum("bsm,bm->bs", SEL, v32, precision=P)
        y = jnp.einsum("bij,bj->bi", Rw, w, precision=P)
        full = jnp.einsum("bsm,bs->bm", SEL, y, precision=P)
        return (full + v32 * (1.0 - actf32)).astype(f64)

    mask = lambda v: actf * ((v * actf) @ hi.G_solve.T) + (1.0 - actf) * v
    lam = applyR(rhs)
    for _ in range(6):
        lam = lam + applyR(rhs - mask(lam))
    c = lam @ hi.G.T
    inact = ~act & ~hi.is_immutable
    v_up = jnp.where(inact, -(du_h + c), -jnp.inf)
    v_lo = jnp.where(inact, dl_h + c, -jnp.inf)
    primal = jnp.max(jnp.maximum(v_up, v_lo), axis=1)
    sgn = jnp.max(jnp.where(act & ~hi.is_eq,
                            jnp.where(side, -lam, lam), -jnp.inf), axis=1)
    sys_res = jnp.max(jnp.abs(mask(lam) - rhs), axis=1)
    return jnp.maximum(jnp.maximum(primal, sgn), sys_res)


ths_j = jnp.asarray(ths)
bad = rich(SEL, Rw, act, side, ths_j)
bad.block_until_ready()
t0 = time.perf_counter()
bad = rich(SEL, Rw, act, side, ths_j)
bad.block_until_ready()
t_rich = time.perf_counter() - t0
badn = np.asarray(bad)
infn = np.asarray(infeas)
ovfn = np.asarray(ovf)
strag = (~infn) & ((badn > 1e-8) | ovfn)
log(f"richardson: {t_rich*1e3:.1f} ms; stragglers bad>1e-8 & !infeas: "
    f"{strag.sum()} ({strag.mean():.4f}); of those capped "
    f"{np.mean(it[strag] >= 71):.3f}")

# full solve timings for second on/off
import os
for sec in ("1", "0"):
    os.environ["LINEARMPC_TPU_CIU_SECOND"] = sec
    mpc2, _ = lmpc.mpc_examples("invpend", 63, 8)
    mpc2.add_constraint(Ax=np.eye(4), lb=-18 * np.ones(4), ub=18 * np.ones(4),
                        ks=range(2, 64))
    mpc2.setup(dtype=jnp.float32)
    e2 = mpc2.engine
    sol = e2.solve_batch(jnp.asarray(ths))
    sol.U.block_until_ready()
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        sol = e2.solve_batch(jnp.asarray(ths))
        sol.U.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    st = np.asarray(sol.status)
    log(f"second={sec}: {B/best:,.0f} solves/s ({best*1e3:.0f} ms) "
        f"resolved={np.mean(st != -1):.5f} opt={np.mean(st==1):.4f} "
        f"infeas={np.mean(st==-3):.4f}")
