"""Micro-cost of the ciu kernel: while_loop vs scan, s=24 vs 16, B=128 vs 256."""
import sys, time, functools

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

import linearmpc_tpu as lmpc
from linearmpc_tpu.ops import pallas_ciu as pc


def log(*a):
    print(*a, file=sys.stderr, flush=True)


mpc, _ = lmpc.mpc_examples("invpend", 63, 8)
mpc.add_constraint(Ax=np.eye(4), lb=-18 * np.ones(4), ub=18 * np.ones(4),
                   ks=range(2, 64))
mpc.setup(dtype=jnp.float32)
e = mpc.engine
arr = e.arrays
m = e.ldp.m
P = jax.lax.Precision.HIGHEST
rng = np.random.default_rng(7)
eps32 = float(np.finfo(np.float32).eps)
softd = jnp.asarray(np.asarray(e.ldp.rho_soft, np.float64) + 4 * eps32,
                    jnp.float32)
eqf = arr.is_eq.astype(jnp.float32)
immutf = arr.is_immutable.astype(jnp.float32)


def mk_inputs(B):
    ths = np.hstack([
        rng.uniform(-8, 8, (B, 4)), rng.uniform(-8, 8, (B, 2)),
        rng.uniform(-2, 2, (B, 1)),
    ])
    th32 = jnp.asarray(ths, jnp.float32)
    du_t = arr.du + jnp.dot(th32, arr.Dth.T, precision=P)
    dl_t = arr.dl + jnp.dot(th32, arr.Dth.T, precision=P)
    return du_t, dl_t


@functools.partial(jax.jit, static_argnames=("s", "n_it", "B"))
def scan_kernel(du_t, dl_t, *, s, n_it, B):
    """n_it kernel calls under lax.scan, no cond -- pure per-call cost."""
    (Tsm_rep, S_slot, Tss_tile, Tss_rep, S_grp_ss,
     Gd, softd_c, du_l, dl_l, eq_c, immut_c,
     lam_l, act_l, side_l, SEL_l, Rw_l) = pc._prep(
        arr.G, softd, du_t, dl_t, eqf, immutf,
        jnp.zeros((B, m), jnp.float32), jnp.zeros((B, m), jnp.float32),
        jnp.ones((B, m), jnp.float32),
        jnp.zeros((B, s * m), jnp.float32),
        jnp.tile(jnp.eye(s, dtype=jnp.float32), (B, 1, 1)), m, s)
    call = pc._build_call(m, s, B, e.primal_tol, e.sign_tol, 3.5e-4, False)
    zero = jnp.zeros((m, B), jnp.float32)

    def body(c, _):
        out = call(Tsm_rep, S_slot, Tss_tile, Tss_rep, S_grp_ss,
                   Gd, softd_c, du_l, dl_l, eq_c, immut_c, *c)
        return tuple(out), 0
    state = (lam_l, act_l, side_l, zero, zero, zero, zero, SEL_l, Rw_l)
    state, _ = jax.lax.scan(body, state, None, length=n_it)
    return state[0]


for s, B in ((24, 128), (16, 128), (16, 256), (16, 384), (24, 64)):
    try:
        du_t, dl_t = mk_inputs(B)
        for n_it in (8, 40):
            out = scan_kernel(du_t, dl_t, s=s, n_it=n_it, B=B)
            out.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(3):
                out = scan_kernel(du_t, dl_t, s=s, n_it=n_it, B=B)
            out.block_until_ready()
            t = (time.perf_counter() - t0) / 3
            if n_it == 8:
                t8 = t
            else:
                per_it = (t - t8) / 32
                log(f"s={s} B={B}: 8it {t8*1e3:.2f} ms, 40it {t*1e3:.2f} ms "
                    f"-> {per_it*1e6:.1f} us/iter, fixed~{(t8-8*per_it)*1e3:.2f} ms")
    except Exception as ex:
        log(f"s={s} B={B}: FAILED {type(ex).__name__}: {str(ex)[:200]}")

# while_loop comparison at s=24 B=128 (cond cost)
@functools.partial(jax.jit, static_argnames=("s", "n_it", "B"))
def while_kernel(du_t, dl_t, *, s, n_it, B):
    out = pc.phase1_ciu_pallas_while(
        arr.G, softd, du_t, dl_t, eqf, immutf,
        jnp.zeros((B, m), jnp.float32), jnp.zeros((B, m), jnp.float32),
        jnp.ones((B, m), jnp.float32),
        jnp.zeros((B, s * m), jnp.float32),
        jnp.tile(jnp.eye(s, dtype=jnp.float32), (B, 1, 1)),
        m=m, s=s, max_iter=n_it, primal_tol=1e-30, sign_tol=1e-30,
        retry_infeas=False)
    return out[0]

for s, B in ((24, 128), (16, 256)):
    du_t, dl_t = mk_inputs(B)
    for n_it in (8, 40):
        out = while_kernel(du_t, dl_t, s=s, n_it=n_it, B=B)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(3):
            out = while_kernel(du_t, dl_t, s=s, n_it=n_it, B=B)
        out.block_until_ready()
        t = (time.perf_counter() - t0) / 3
        if n_it == 8:
            t8 = t
        else:
            per_it = (t - t8) / 32
            log(f"while s={s} B={B}: {per_it*1e6:.1f} us/iter "
                f"(tol=0 so no early exit)")
