import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update('jax_enable_x64', True)
import numpy as np, jax.numpy as jnp, linearmpc_tpu as lmpc
mpc, _ = lmpc.mpc_examples('invpend_contact')
mpc.setup(dtype=jnp.float32)
e = mpc.engine
print('m', e.ldp.m, 'frontier', e.use_frontier, 'pallas', getattr(e,'frontier_pallas',None), flush=True)
rng = np.random.default_rng(0)
B = 128
ths = rng.uniform(-0.3, 0.3, (B, e.ldp.n_theta))
t0 = time.perf_counter()
sol = e.solve_batch(ths); sol.U.block_until_ready()
t = time.perf_counter()-t0
st = np.asarray(sol.status)
print(f'compile+first {t:.0f}s; solved {np.mean(st==1):.3f} '
      f'(-1 {np.mean(st==-1):.3f} / -2 {np.mean(st==-2):.3f} / -3 {np.mean(st==-3):.3f})', flush=True)
if (st==1).any():
    # CPU f64 oracle comparison on a few solved lanes
    mpc2, _ = lmpc.mpc_examples('invpend_contact')
    import jax as j2
    # compare fvals against host DFS on first 2 solved lanes
    print('fval sample:', np.asarray(sol.fval)[:4], flush=True)
