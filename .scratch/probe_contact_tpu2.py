import sys, os, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update('jax_enable_x64', True)
import numpy as np, jax.numpy as jnp, linearmpc_tpu as lmpc
NP = int(os.environ.get("PNP", "4"))
B = int(os.environ.get("PB", "8"))
mpc, _ = lmpc.mpc_examples('invpend_contact', NP, min(NP, 10))
mpc.setup(dtype=jnp.float32)
e = mpc.engine
print('m', e.ldp.m, 'frontier', e.use_frontier, 'pallas', getattr(e, 'frontier_pallas', None), flush=True)
rng = np.random.default_rng(3)
ths = rng.uniform(-0.3, 0.3, (B, e.ldp.n_theta))
t0 = time.perf_counter()
sol = e.solve_batch(ths)
st = np.asarray(sol.status)
t = time.perf_counter() - t0
print(f'compile+first {t:.0f}s; solved {np.mean(st==1):.3f} '
      f'(-1 {np.mean(st==-1):.3f} / -2 {np.mean(st==-2):.3f}) '
      f'iters mean {np.mean(np.asarray(sol.iters)):.0f}', flush=True)
print('fval[:4]', np.asarray(sol.fval)[:4], flush=True)
t0 = time.perf_counter()
sol = e.solve_batch(ths)
t = time.perf_counter() - t0
print(f'steady {t:.1f}s -> {B/t:.2f} B&B solves/s', flush=True)
