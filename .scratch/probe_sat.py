import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update('jax_enable_x64', True)
import numpy as np, jax.numpy as jnp, linearmpc_tpu as lmpc
mpc, _ = lmpc.mpc_examples('satellite')
mpc.setup(dtype=jnp.float32)
e = mpc.engine
rng = np.random.default_rng(1234)
B = 512
ths = rng.uniform(-1.0, 1.0, (B, e.ldp.n_theta))
t0 = time.perf_counter()
sol = e.solve_batch(ths); sol.U.block_until_ready()
print(f'compile+first {time.perf_counter()-t0:.0f}s', flush=True)
t0 = time.perf_counter()
for _ in range(2): sol = e.solve_batch(ths)
sol.U.block_until_ready()
t = (time.perf_counter()-t0)/2
st = np.asarray(sol.status)
print(f'{B/t:,.0f} B&B solves/s, solved {np.mean(st==1):.4f}', flush=True)
# golden check
print('golden:', mpc.compute_control([5.0,5,0,0]) if False else 'skip')
