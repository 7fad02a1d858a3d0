"""TPU probe: m=256 compact tier stage budget + tuning knobs.

Usage: python .scratch/probe_ciu256_r5.py [REFINE] [KSTEP]
Builds the bench's m=256 case and times the full engine solve; env knobs
set before import so the engine bakes them in.
"""
import os, sys, time

REFINE = sys.argv[1] if len(sys.argv) > 1 else "6"
KSTEP = sys.argv[2] if len(sys.argv) > 2 else "1"
os.environ["LINEARMPC_TPU_CIU_REFINE"] = REFINE
os.environ["LINEARMPC_TPU_CIU_KSTEP"] = KSTEP
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
import linearmpc_tpu as lmpc
from linearmpc_tpu.ops.reference_solver import solve_ldp_numpy

mpc, _ = lmpc.mpc_examples("invpend", 63, 8)
mpc.add_constraint(Ax=np.eye(4), lb=-18 * np.ones(4), ub=18 * np.ones(4),
                   ks=range(2, 64))
mpc.setup(dtype=jnp.float32)
e = mpc.engine
print(f"m={e.ldp.m} s={e.ciu_s_max}/{e._ciu_s2} chunk={e._ciu_pallas_chunk} "
      f"refine={REFINE} kstep={KSTEP}", flush=True)
rng = np.random.default_rng(1234)
B = 8192
ths = jnp.asarray(np.hstack([
    rng.uniform(-8, 8, (B, 4)), rng.uniform(-8, 8, (B, 2)),
    rng.uniform(-2, 2, (B, 1)),
]), jnp.float64)
ths.block_until_ready()
t0 = time.perf_counter()
sol = e.solve_batch(ths); sol.U.block_until_ready()
print(f"compile+first: {time.perf_counter()-t0:.1f} s", flush=True)
best = 1e9
for r in range(3):
    t0 = time.perf_counter()
    sol = e.solve_batch(ths); sol.U.block_until_ready()
    best = min(best, time.perf_counter() - t0)
st = np.asarray(sol.status)
err = 0.0; nref = 0
for i in range(64):
    U_ref, *_r, s_ref = solve_ldp_numpy(e.ldp, np.asarray(ths[i], np.float64))
    if s_ref == 1 and st[i] == 1:
        nref += 1
        err = max(err, float(np.max(np.abs(np.asarray(sol.U[i], np.float64) - U_ref))))
print(f"refine={REFINE} kstep={KSTEP}: {B/best:,.0f} solves/s "
      f"({best*1e3:.1f} ms/batch), resolved {np.mean(st != -1):.5f}, "
      f"err {err:.2e} over {nref}", flush=True)
