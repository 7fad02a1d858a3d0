import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update('jax_enable_x64', True)
import numpy as np, jax.numpy as jnp, linearmpc_tpu as lmpc
from linearmpc_tpu.ops.pallas_ciu import ciu_max_chunk_lanes, init_compact_batch, phase1_ciu_pallas_while
from linearmpc_tpu.ops.reference_solver import solve_ldp_numpy

# m = 256: invpend (50, 8) + state box over 62 steps... need ks up to Np
mpc, _ = lmpc.mpc_examples("invpend", 63, 8)
mpc.add_constraint(Ax=np.eye(4), lb=-18*np.ones(4), ub=18*np.ones(4), ks=range(2, 64))
mpc.setup(dtype=jnp.float32)
e = mpc.engine
m = e.ldp.m
s = 24
print('m', m, 'budget-gated chunk @14M:', ciu_max_chunk_lanes(m, s),
      '@36M:', ciu_max_chunk_lanes(m, s, 36*2**20), flush=True)
arr = e.arrays
B = 128
rng = np.random.default_rng(0)
ths = np.hstack([rng.uniform(-8,8,(B,4)), rng.uniform(-8,8,(B,2)), rng.uniform(-2,2,(B,1))])
P = jax.lax.Precision.HIGHEST
th32 = jnp.asarray(ths, jnp.float32)
du_t = arr.du + jnp.dot(th32, arr.Dth.T, precision=P)
dl_t = arr.dl + jnp.dot(th32, arr.Dth.T, precision=P)
eps32 = float(np.finfo(np.float32).eps)
softd = jnp.asarray(np.asarray(e.ldp.rho_soft, np.float64) + 4*eps32, jnp.float32)
Rw0 = jnp.broadcast_to(jnp.eye(s, dtype=jnp.float32), (B, s, s))
SEL0 = jnp.zeros((B, s*m), jnp.float32)
t0 = time.perf_counter()
out = phase1_ciu_pallas_while(
    arr.G, softd, du_t, dl_t, arr.is_eq.astype(jnp.float32),
    arr.is_immutable.astype(jnp.float32),
    jnp.zeros((B, m), jnp.float32), jnp.zeros((B, m), jnp.float32),
    jnp.ones((B, m), jnp.float32), SEL0, Rw0,
    m=m, s=s, max_iter=2*m+24, primal_tol=e.primal_tol, sign_tol=e.sign_tol)
out[0].block_until_ready()
print(f'compile+run: {time.perf_counter()-t0:.1f} s', flush=True)
lam, act, side, iters, done, infeas, ovf = out[:7]
print('done', float(np.mean(np.asarray(done))), 'infeas', float(np.mean(np.asarray(infeas))),
      'ovf', float(np.mean(np.asarray(ovf))), 'iters p50/max',
      float(np.percentile(np.asarray(iters),50)), int(np.asarray(iters).max()), flush=True)
from linearmpc_tpu.ops.dual_active_set import polish_solution
hi = e.arrays_hi
sol = jax.vmap(lambda t,a,sd: polish_solution(hi, t, a, sd))(jnp.asarray(ths), act, side)
U = np.asarray(sol.U, np.float64)
err=0.0; n=0
for i in range(32):
    U_ref, *_r, s_ref = solve_ldp_numpy(e.ldp, ths[i])
    if s_ref == 1 and np.asarray(done)[i] and not np.asarray(infeas)[i] and not np.asarray(ovf)[i]:
        n+=1; err=max(err, float(np.max(np.abs(U[i]-U_ref))))
print('oracle err', err, 'over', n, flush=True)
# throughput at B=1024
B2 = 1024
ths2 = np.hstack([rng.uniform(-8,8,(B2,4)), rng.uniform(-8,8,(B2,2)), rng.uniform(-2,2,(B2,1))])
th232 = jnp.asarray(ths2, jnp.float32)
du2 = arr.du + jnp.dot(th232, arr.Dth.T, precision=P)
dl2 = arr.dl + jnp.dot(th232, arr.Dth.T, precision=P)
import functools
run = jax.jit(lambda du, dl: phase1_ciu_pallas_while(
    arr.G, softd, du, dl, arr.is_eq.astype(jnp.float32),
    arr.is_immutable.astype(jnp.float32),
    jnp.zeros((B2, m), jnp.float32), jnp.zeros((B2, m), jnp.float32),
    jnp.ones((B2, m), jnp.float32), jnp.zeros((B2, s*m), jnp.float32),
    jnp.broadcast_to(jnp.eye(s, dtype=jnp.float32), (B2, s, s)),
    m=m, s=s, max_iter=2*m+24, primal_tol=e.primal_tol, sign_tol=e.sign_tol)[0])
r = run(du2, dl2); r.block_until_ready()
t0 = time.perf_counter()
for _ in range(3): r = run(du2, dl2)
r.block_until_ready()
t = (time.perf_counter()-t0)/3
print(f'bulk m={m}: {t*1e3:.0f} ms / {B2} lanes = {B2/t:,.0f} bulk-solves/s', flush=True)
