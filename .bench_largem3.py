import sys, time
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import linearmpc_tpu as lmpc
from linearmpc_tpu.ops.dual_active_set import solve_single

which = sys.argv[1]; B = int(sys.argv[2])
mpc, _ = lmpc.mpc_examples("invpend", 30, 8)
mpc.add_constraint(Ax=np.eye(4), lb=-18 * np.ones(4), ub=18 * np.ones(4), ks=range(2, 12))
mpc.setup(dtype=jnp.float32)
e = mpc.engine
rng = np.random.default_rng(0)
th = jnp.asarray(np.hstack([
    rng.uniform(-12, 12, (B, 4)), rng.uniform(-12, 12, (B, 2)), rng.uniform(-2, 2, (B, 1)),
]), jnp.float64)
th.block_until_ready()
kw = dict(e._solve_kw)
kw["bulk_inverse_updates"] = which == "woodbury"
f = jax.jit(lambda t: jax.vmap(lambda x: solve_single(e.arrays, x, ldp_hi=e.arrays_hi, **kw))(t))
t0 = time.perf_counter()
sol = f(th); sol.U.block_until_ready()
print(f"{which} B={B}: compile+run {time.perf_counter()-t0:.1f}s converged "
      f"{float(np.mean(np.asarray(sol.status)==1)):.4f}", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    outs = [f(th) for _ in range(4)]
    outs[-1].U.block_until_ready()
    best = min(best, (time.perf_counter()-t0)/4)
print(f"{which} B={B}: {best*1e3:.2f} ms/batch -> {B/best:,.0f} solves/s", flush=True)
