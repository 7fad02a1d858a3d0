import sys, os, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update('jax_enable_x64', True)
import numpy as np, jax.numpy as jnp, linearmpc_tpu as lmpc
B = int(os.environ.get("PB", "8"))
mpc, _ = lmpc.mpc_examples('invpend_contact')
mpc.setup(dtype=jnp.float32)
e = mpc.engine
print('m', e.ldp.m, 'frontier', e.use_frontier, 'B', B, flush=True)
rng = np.random.default_rng(0)
ths = rng.uniform(-0.3, 0.3, (B, e.ldp.n_theta))
t0 = time.perf_counter()
sol = e.solve_batch(ths); sol.U.block_until_ready()
t = time.perf_counter()-t0
st = np.asarray(sol.status)
print(f'compile+first {t:.0f}s; solved {np.mean(st==1):.3f} '
      f'(-1 {np.mean(st==-1):.3f}) iters {np.mean(np.asarray(sol.iters)):.0f}', flush=True)
t0 = time.perf_counter()
sol = e.solve_batch(ths); sol.U.block_until_ready()
print(f'steady {time.perf_counter()-t0:.1f}s -> {B/(time.perf_counter()-t0):.1f} solves/s', flush=True)
