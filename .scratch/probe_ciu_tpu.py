import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update('jax_enable_x64', True)
import numpy as np, jax.numpy as jnp, linearmpc_tpu as lmpc
from linearmpc_tpu.ops.reference_solver import solve_ldp_numpy

mpc_c, _ = lmpc.mpc_examples("invpend", 50, 8)
mpc_c.add_constraint(Ax=np.eye(4), lb=-18 * np.ones(4), ub=18 * np.ones(4),
                     ks=range(2, 32))
mpc_c.setup(dtype=jnp.float32)
e = mpc_c.engine
print('m', e.ldp.m, 's_max', e.ciu_s_max, 'ciu', e.use_ciu_batch,
      'ciu_pallas', getattr(e, 'use_ciu_pallas', None),
      'chunk', getattr(e, '_ciu_pallas_chunk', None), flush=True)
rng = np.random.default_rng(1234)
B = 8192
ths = jnp.asarray(np.hstack([
    rng.uniform(-10, 10, (B, 4)), rng.uniform(-10, 10, (B, 2)),
    rng.uniform(-2, 2, (B, 1)),
]), jnp.float64)
ths.block_until_ready()
t0 = time.perf_counter()
sol = e.solve_batch(ths); sol.U.block_until_ready()
print(f'compile+first: {time.perf_counter()-t0:.1f} s', flush=True)
t0 = time.perf_counter()
for _ in range(3):
    sol = e.solve_batch(ths)
sol.U.block_until_ready()
t = (time.perf_counter() - t0) / 3
it = np.asarray(sol.iters); st = np.asarray(sol.status)
print(f'{t*1e3:.0f} ms/batch = {B/t:,.0f} solves/s; iters p50/p90/p99/max '
      f'{np.percentile(it,50):.0f}/{np.percentile(it,90):.0f}/{np.percentile(it,99):.0f}/{it.max()}; '
      f'opt {np.mean(st==1):.4f} infeas {np.mean(st==-3):.4f} unres {np.mean(st==-1):.4f}', flush=True)
err = 0.0; n_ref = 0
for i in range(96):
    U_ref, *_r, s_ref = solve_ldp_numpy(e.ldp, np.asarray(ths[i], np.float64))
    if s_ref == 1:
        n_ref += 1
        assert st[i] == 1, (i, st[i])
        err = max(err, float(np.max(np.abs(np.asarray(sol.U[i], np.float64) - U_ref))))
print(f'max err {err:.2e} over {n_ref} oracle-feasible lanes', flush=True)
