import time
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import linearmpc_tpu as lmpc
from linearmpc_tpu.ops.dual_active_set import solve_single

print("PLATFORM:", jax.devices()[0].platform, flush=True)
mpc, _ = lmpc.mpc_examples("invpend", 30, 8)
mpc.add_constraint(Ax=np.eye(4), lb=-18 * np.ones(4), ub=18 * np.ones(4), ks=range(2, 12))
mpc.setup(dtype=jnp.float32)
e = mpc.engine
print("m =", e.ldp.m, "n =", e.ldp.n, flush=True)

rng = np.random.default_rng(0)
B, K = 8192, 8
batches = [jnp.asarray(np.hstack([
    rng.uniform(-12, 12, (B, 4)), rng.uniform(-12, 12, (B, 2)), rng.uniform(-2, 2, (B, 1)),
]), jnp.float64) for _ in range(K)]
for b in batches: b.block_until_ready()

def mk(updates):
    kw = dict(e._solve_kw)
    kw["bulk_inverse_updates"] = updates
    @jax.jit
    def f(th):
        return jax.vmap(lambda t: solve_single(e.arrays, t, ldp_hi=e.arrays_hi, **kw))(th)
    return f

for name, updates in (("woodbury-updates", True), ("masked-cholesky", False)):
    f = mk(updates)
    sol = f(batches[0]); sol.U.block_until_ready()
    conv = float(np.mean(np.asarray(sol.status) == 1))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f(b) for b in batches]
        outs[-1].U.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name}: {best*1e3:.2f} ms/batch -> {B/best:,.0f} solves/s  (converged {conv:.4f})", flush=True)
