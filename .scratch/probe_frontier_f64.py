"""Bisect the f64 frontier fault: run solve_bnb_frontier on TPU f64 directly."""
import sys, os, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update('jax_enable_x64', True)
if os.environ.get('PCPU'): jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp, linearmpc_tpu as lmpc
from linearmpc_tpu.ops.bnb_frontier import make_xla_relax, solve_bnb_frontier

NP = int(os.environ.get("PNP", "4"))
NL = int(os.environ.get("PNL", "0"))
B = int(os.environ.get("PB", "8"))
mpc, _ = lmpc.mpc_examples('invpend_contact', NP, min(NP, 4))
mpc.setup(dtype=jnp.float32)
e = mpc.engine
hi = e.arrays_hi
m = e.ldp.m
print('m', m, 'B', B, 'node_limit', NL or e.bnb_node_limit, flush=True)
relax = make_xla_relax(hi, max_iter=min(e.iter_limit, 2*m+24),
                       primal_tol=1e-6, sign_tol=1e-11, mode="cholesky")
rng = np.random.default_rng(0)
ths = jnp.asarray(rng.uniform(-0.3, 0.3, (B, e.ldp.n_theta)), jnp.float64)
fn = jax.jit(lambda ths: solve_bnb_frontier(
    hi, hi, ths, relax, stack_cap=max(2*int(np.asarray(e.ldp.is_binary).sum())+2, 4),
    node_limit=NL or e.bnb_node_limit, use_cholesky=True, warm_nodes=True,
    bin_tol=float(os.environ.get("PBT", "1e-6"))))
t0 = time.perf_counter()
sol = fn(ths)
sol.U.block_until_ready()
st = np.asarray(sol.status)
print(f'compile+run {time.perf_counter()-t0:.0f}s solved {np.mean(st==1):.2f} '
      f'iters {np.asarray(sol.iters)[:8]}', flush=True)
import collections
print('status counts', dict(collections.Counter(st.tolist())),
      'fval', np.asarray(sol.fval)[:4], flush=True)
