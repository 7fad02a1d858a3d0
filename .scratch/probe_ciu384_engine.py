import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update('jax_enable_x64', True)
import numpy as np, jax.numpy as jnp, linearmpc_tpu as lmpc
from linearmpc_tpu.ops.reference_solver import solve_ldp_numpy

mpc, _ = lmpc.mpc_examples("invpend", 97, 8)
mpc.add_constraint(Ax=np.eye(4), lb=-18*np.ones(4), ub=18*np.ones(4), ks=range(2, 96))
mpc.setup(dtype=jnp.float32)
e = mpc.engine
print('m', e.ldp.m, 's_max', e.ciu_s_max, 'ciu_pallas', e.use_ciu_pallas, 'chunk', e._ciu_pallas_chunk, flush=True)
rng = np.random.default_rng(1234)
B = 8192
ths = jnp.asarray(np.hstack([
    rng.uniform(-8, 8, (B, 4)), rng.uniform(-8, 8, (B, 2)), rng.uniform(-2, 2, (B, 1)),
]), jnp.float64)
ths.block_until_ready()
t0 = time.perf_counter()
sol = e.solve_batch(ths); sol.U.block_until_ready()
print(f'compile+first: {time.perf_counter()-t0:.1f} s', flush=True)
t0 = time.perf_counter()
for _ in range(3):
    sol = e.solve_batch(ths)
sol.U.block_until_ready()
t = (time.perf_counter()-t0)/3
st = np.asarray(sol.status)
print(f'{t*1e3:.0f} ms/batch = {B/t:,.0f} solves/s; opt {np.mean(st==1):.4f} '
      f'infeas {np.mean(st==-3):.4f} unres {np.mean(st==-1):.4f}', flush=True)
err=0.0; n=0
for i in range(64):
    U_ref, *_r, s_ref = solve_ldp_numpy(e.ldp, np.asarray(ths[i], np.float64))
    if s_ref == 1:
        n += 1
        assert st[i] == 1, (i, st[i])
        err = max(err, float(np.max(np.abs(np.asarray(sol.U[i], np.float64) - U_ref))))
print('oracle err', err, 'over', n, flush=True)
