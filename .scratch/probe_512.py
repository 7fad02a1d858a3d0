import sys, time, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
import linearmpc_tpu as lmpc

mpc, _ = lmpc.mpc_examples("invpend", 127, 8)
mpc.add_constraint(Ax=np.eye(4), lb=-18 * np.ones(4), ub=18 * np.ones(4),
                   ks=range(2, 128))
mpc.setup(dtype=jnp.float32)
e = mpc.engine
print(f"m={e.ldp.m} s_max={e.ciu_s_max} s2={e._ciu_s2} "
      f"pallas={e.use_ciu_pallas} chunk={e._ciu_pallas_chunk}", flush=True)
rng = np.random.default_rng(1234)
B = 4096
ths = jnp.asarray(np.hstack([
    rng.uniform(-6, 6, (B, 4)), rng.uniform(-6, 6, (B, 2)),
    rng.uniform(-2, 2, (B, 1)),
]), jnp.float64)
ths.block_until_ready()
t0 = time.perf_counter()
sol = e.solve_batch(ths); sol.U.block_until_ready()
print(f"compile+first: {time.perf_counter()-t0:.1f} s", flush=True)
res = []
for r in range(3):
    t0 = time.perf_counter()
    sol = e.solve_batch(ths); sol.U.block_until_ready()
    dt = time.perf_counter() - t0
    st = np.asarray(sol.status)
    res.append(float(np.mean(st != -1)))
    print(f"run {r}: {B/dt:,.0f} solves/s, resolved {res[-1]:.6f} "
          f"(opt {np.mean(st==1):.4f} infeas {np.mean(st==-3):.4f}), "
          f"unresolved lanes {int(np.sum(st==-1))}", flush=True)
print(json.dumps({"resolved_runs": res}), flush=True)
