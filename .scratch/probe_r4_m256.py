"""Round-4 probe: m=256 compact tier with the second-chance pass on TPU."""
import os
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

import linearmpc_tpu as lmpc
from linearmpc_tpu.ops.reference_solver import solve_ldp_numpy


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(second):
    os.environ["LINEARMPC_TPU_CIU_SECOND"] = "1" if second else "0"
    mpc, _ = lmpc.mpc_examples("invpend", 63, 8)
    mpc.add_constraint(Ax=np.eye(4), lb=-18 * np.ones(4), ub=18 * np.ones(4),
                       ks=range(2, 64))
    mpc.setup(dtype=jnp.float32)
    e = mpc.engine
    log(f"second={second}: m={e.ldp.m} s_max={e.ciu_s_max} s2={e._ciu_s2} "
        f"chunk={e._ciu_pallas_chunk} s2_chunk={e._ciu_s2_chunk}")
    rng = np.random.default_rng(99)
    B = 8192
    ths = jnp.asarray(np.hstack([
        rng.uniform(-8, 8, (B, 4)), rng.uniform(-8, 8, (B, 2)),
        rng.uniform(-2, 2, (B, 1)),
    ]), jnp.float64)
    ths.block_until_ready()
    t0 = time.perf_counter()
    sol = e.solve_batch(ths)
    sol.U.block_until_ready()
    log(f"  compile+run: {time.perf_counter()-t0:.1f} s")
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        sol = e.solve_batch(ths)
        sol.U.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    st = np.asarray(sol.status)
    log(f"  {B/best:,.0f} solves/s ({best*1e3:.1f} ms/batch), "
        f"resolved {np.mean(st != -1):.5f} (opt {np.mean(st == 1):.4f} "
        f"/ infeas {np.mean(st == -3):.4f}), mean iters "
        f"{np.mean(np.asarray(sol.iters)):.1f}")
    # oracle errors over the first 64 lanes (fast sanity; bench does 256+)
    err = 0.0
    n_ref = 0
    dis = 0
    for i in range(64):
        U_ref, *_r, s_ref = solve_ldp_numpy(e.ldp, np.asarray(ths[i], np.float64))
        if s_ref == 1:
            if st[i] == 1:
                n_ref += 1
                err = max(err, float(np.max(np.abs(
                    np.asarray(sol.U[i], np.float64) - U_ref))))
            else:
                dis += 1
        elif st[i] == 1:
            dis += 1
    log(f"  max err {err:.2e} over {n_ref} lanes, status disagreements {dis}")
    return B / best


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "on"):
        run(True)
    if which in ("both", "off"):
        run(False)
