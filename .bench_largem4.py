import time
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import linearmpc_tpu as lmpc

print("PLATFORM:", jax.devices()[0].platform, flush=True)
mpc, _ = lmpc.mpc_examples("invpend", 30, 8)
mpc.add_constraint(Ax=np.eye(4), lb=-18 * np.ones(4), ub=18 * np.ones(4), ks=range(2, 12))
mpc.setup(dtype=jnp.float32)
e = mpc.engine
print("m =", e.ldp.m, "iu batch:", e.use_iu_batch, "chunk:", e._iu_chunk, flush=True)
rng = np.random.default_rng(0)
B, K = 8192, 8
batches = [jnp.asarray(np.hstack([
    rng.uniform(-12, 12, (B, 4)), rng.uniform(-12, 12, (B, 2)), rng.uniform(-2, 2, (B, 1)),
]), jnp.float64) for _ in range(K)]
for b in batches: b.block_until_ready()
sol = e.solve_batch(batches[0]); sol.U.block_until_ready()
print("converged:", float(np.mean(np.asarray(sol.status) == 1)),
      "mean iters:", float(np.mean(np.asarray(sol.iters))), flush=True)
from linearmpc_tpu.ops.reference_solver import solve_ldp_numpy
U = np.asarray(sol.U[:128], np.float64); err = 0.0; n = 0
for i in range(128):
    Ur, *_r, s = solve_ldp_numpy(e.ldp, np.asarray(batches[0][i], np.float64))
    if s == 1:
        err = max(err, float(np.max(np.abs(U[i] - Ur)))); n += 1
print(f"max err vs oracle over {n} certified lanes: {err:.3e}", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    outs = [e.solve_batch(b) for b in batches]
    outs[-1].U.block_until_ready()
    best = min(best, (time.perf_counter() - t0) / K)
print(f"large-m sustained: {best*1e3:.2f} ms/batch -> {B/best:,.0f} solves/s", flush=True)
