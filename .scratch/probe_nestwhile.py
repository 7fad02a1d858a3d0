"""Does an OUTER while_loop around the f64 cholesky relax fault on axon?"""
import sys, os, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update('jax_enable_x64', True)
import numpy as np, jax.numpy as jnp, linearmpc_tpu as lmpc
from linearmpc_tpu.ops.dual_active_set import _active_set_loop, _primal_feasible

NP = int(os.environ.get("PNP", "4"))
mpc, _ = lmpc.mpc_examples('invpend_contact', NP, min(NP, 4))
mpc.setup(dtype=jnp.float32)
e = mpc.engine
hi = e.arrays_hi
m = e.ldp.m
B = 8
rng = np.random.default_rng(0)
ths = jnp.asarray(rng.uniform(-0.3, 0.3, (B, e.ldp.n_theta)), jnp.float64)
du = hi.du + ths @ hi.Dth.T
dl = hi.dl + ths @ hi.Dth.T
R = int(os.environ.get("PR", "6"))

@jax.jit
def run(du, dl):
    def one(dut, dlt):
        def body(c):
            k, l0, a0, s0, acc = c
            st = _active_set_loop(hi, dut, dlt, hi.is_eq, hi.is_immutable,
                                  l0, a0, s0, max_iter=200, primal_tol=1e-6,
                                  sign_tol=1e-11, use_cholesky=True)
            # perturb the start a bit each round like branching would
            return (k + 1, st.lam * 0.5, st.active, st.side,
                    acc + st.iters)
        init = (jnp.int32(0), jnp.zeros(m, jnp.float64),
                jnp.zeros(m, bool), jnp.ones(m, bool), jnp.int32(0))
        out = jax.lax.while_loop(lambda c: c[0] < R, body, init)
        return out[4]
    return jax.vmap(one)(du, dl)

t0 = time.perf_counter()
it = run(du, dl)
it.block_until_ready()
print(f"rounds={R} ok, {time.perf_counter()-t0:.0f}s total iters {np.asarray(it)}", flush=True)
