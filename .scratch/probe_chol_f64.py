"""Isolate: does the f64 masked-Cholesky active-set loop fault on axon at m=250?"""
import sys, os, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update('jax_enable_x64', True)
import numpy as np, jax.numpy as jnp, linearmpc_tpu as lmpc
from linearmpc_tpu.ops.dual_active_set import _active_set_loop, _primal_feasible

mpc, _ = lmpc.mpc_examples('invpend_contact')
mpc.setup(dtype=jnp.float32)
e = mpc.engine
hi = e.arrays_hi
m = e.ldp.m
B = int(os.environ.get("PB", "8"))
rng = np.random.default_rng(0)
ths = jnp.asarray(rng.uniform(-0.3, 0.3, (B, e.ldp.n_theta)), jnp.float64)
du = hi.du + ths @ hi.Dth.T
dl = hi.dl + ths @ hi.Dth.T
eq = jnp.broadcast_to(hi.is_eq, (B, m))
lam0 = jnp.zeros((B, m), jnp.float64)
act0 = jnp.broadcast_to(hi.is_eq, (B, m))
side0 = jnp.ones((B, m), bool)

@jax.jit
def run(du, dl, eq, lam0, act0, side0):
    def one(dut, dlt, eql, l0, a0, s0):
        st = _active_set_loop(hi, dut, dlt, eql, hi.is_immutable, l0, a0, s0,
                              max_iter=524, primal_tol=1e-6, sign_tol=1e-11,
                              use_cholesky=True)
        feas = _primal_feasible(hi, dut, dlt, st.lam, st.active, st.side, 1e-6)
        return st.done, feas, st.iters
    return jax.vmap(one)(du, dl, eq, lam0, act0, side0)

t0 = time.perf_counter()
done, feas, it = run(du, dl, eq, lam0, act0, side0)
done.block_until_ready()
print(f"compile+run {time.perf_counter()-t0:.0f}s done {np.mean(np.asarray(done)):.2f} "
      f"feas {np.mean(np.asarray(feas)):.2f} iters {np.asarray(it)}", flush=True)
