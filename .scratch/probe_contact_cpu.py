import sys, os, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update('jax_enable_x64', True)
jax.config.update('jax_platforms', 'cpu')
import numpy as np, linearmpc_tpu as lmpc
NP = int(os.environ.get("PNP", "10"))
NC = int(os.environ.get("PNC", str(min(int(os.environ.get("PNP","10")),10))))
B = int(os.environ.get("PB", "8"))
mpc, _ = lmpc.mpc_examples('invpend_contact', NP, NC)
mpc.setup()
e = mpc.engine
print('m', e.ldp.m, 'nb', int(np.asarray(e.ldp.is_binary).sum()), flush=True)
rng = np.random.default_rng(0)
ths = rng.uniform(-0.3, 0.3, (B, e.ldp.n_theta))
t0 = time.perf_counter()
sol = e.solve_batch(ths)
st = np.asarray(sol.status)
print(f'{time.perf_counter()-t0:.1f}s solved {np.mean(st==1):.2f} iters mean {np.mean(np.asarray(sol.iters)):.0f} max {np.max(np.asarray(sol.iters))}', flush=True)
