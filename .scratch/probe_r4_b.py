"""Probe new compact defaults on TPU: m=256 (second-chance v2) and m=512."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import linearmpc_tpu as lmpc
from linearmpc_tpu.ops.reference_solver import solve_ldp_numpy

def log(*a):
    print(*a, file=sys.stderr, flush=True)

def run(Np, ks_end, B, n_check, lo):
    mpc, _ = lmpc.mpc_examples("invpend", Np, 8)
    mpc.add_constraint(Ax=np.eye(4), lb=-18 * np.ones(4), ub=18 * np.ones(4),
                       ks=range(2, ks_end))
    mpc.setup(dtype=jnp.float32)
    e = mpc.engine
    log(f"m={e.ldp.m} s_max={e.ciu_s_max} s2={e._ciu_s2} chunk={e._ciu_pallas_chunk}")
    rng = np.random.default_rng(99)
    ths = jnp.asarray(np.hstack([
        rng.uniform(-lo, lo, (B, 4)), rng.uniform(-lo, lo, (B, 2)),
        rng.uniform(-2, 2, (B, 1)),
    ]), jnp.float64)
    ths.block_until_ready()
    t0 = time.perf_counter()
    sol = e.solve_batch(ths)
    sol.U.block_until_ready()
    log(f"  compile+run {time.perf_counter()-t0:.0f} s")
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        sol = e.solve_batch(ths)
        sol.U.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    st = np.asarray(sol.status)
    log(f"  {B/best:,.0f} solves/s ({best*1e3:.0f} ms) resolved {np.mean(st != -1):.5f} "
        f"(opt {np.mean(st==1):.4f} / infeas {np.mean(st==-3):.4f})")
    err, n_ref, dis = 0.0, 0, 0
    for i in range(n_check):
        U_ref, *_r, s_ref = solve_ldp_numpy(e.ldp, np.asarray(ths[i], np.float64))
        if s_ref == 1 and st[i] == 1:
            n_ref += 1
            err = max(err, float(np.max(np.abs(np.asarray(sol.U[i], np.float64) - U_ref))))
        elif s_ref == 1 or st[i] == 1:
            dis += 1
    log(f"  err {err:.2e} over {n_ref}, disagreements {dis}/{n_check}")

log("== m=256")
run(63, 64, 8192, 64, 8.0)
log("== m=512")
run(127, 128, 4096, 32, 6.0)
