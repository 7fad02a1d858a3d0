import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update('jax_enable_x64', True)
import numpy as np, jax.numpy as jnp, linearmpc_tpu as lmpc
from linearmpc_tpu.ops.compact_iu import _active_set_loop_ciu

mpc_c, _ = lmpc.mpc_examples("invpend", 30, 8)
mpc_c.add_constraint(Ax=np.eye(4), lb=-18 * np.ones(4), ub=18 * np.ones(4),
                     ks=range(2, 32))
mpc_c.setup(dtype=jnp.float32)
e = mpc_c.engine
m = e.ldp.m
print('m', m, 's_max', e.ciu_s_max, 'ciu', e.use_ciu_batch, flush=True)
rng = np.random.default_rng(1234)
B = 8192
ths = jnp.asarray(np.hstack([
    rng.uniform(-10, 10, (B, 4)), rng.uniform(-10, 10, (B, 2)),
    rng.uniform(-2, 2, (B, 1)),
]), jnp.float64)
ths.block_until_ready()

# full production path
sol = e.solve_batch(ths); sol.U.block_until_ready()
t0 = time.perf_counter()
for _ in range(3):
    sol = e.solve_batch(ths)
sol.U.block_until_ready()
t_full = (time.perf_counter() - t0) / 3
it = np.asarray(sol.iters)
st = np.asarray(sol.status)
print(f'full: {t_full*1e3:.0f} ms/batch = {B/t_full:,.0f} solves/s; '
      f'iters p50/p90/p99/max = {np.percentile(it,50):.0f}/{np.percentile(it,90):.0f}/'
      f'{np.percentile(it,99):.0f}/{it.max()}; opt {np.mean(st==1):.3f} infeas {np.mean(st==-3):.3f}', flush=True)

# bulk phase only (f32 compact loop)
arr = e.arrays
s_max = e.ciu_s_max
bulk_cap = min(e.iter_limit, 2 * m + 24)
P = jax.lax.Precision.HIGHEST

@jax.jit
def bulk_only(ths):
    th32 = ths.astype(jnp.float32)
    du_t = arr.du + jnp.dot(th32, arr.Dth.T, precision=P)
    dl_t = arr.dl + jnp.dot(th32, arr.Dth.T, precision=P)
    st, ovf, cc = jax.vmap(
        lambda dut, dlt: _active_set_loop_ciu(
            arr, dut, dlt, arr.is_eq, arr.is_immutable,
            jnp.zeros(m, jnp.float32), arr.is_eq, jnp.ones(m, bool),
            s_max=s_max, max_iter=bulk_cap,
            primal_tol=e.primal_tol, sign_tol=e.sign_tol, return_carry=True)
    )(du_t, dl_t)
    return st.lam, st.iters, st.infeas, ovf

out = bulk_only(ths); out[0].block_until_ready()
t0 = time.perf_counter()
for _ in range(3):
    out = bulk_only(ths)
out[0].block_until_ready()
t_bulk = (time.perf_counter() - t0) / 3
itb = np.asarray(out[1])
print(f'bulk only: {t_bulk*1e3:.0f} ms/batch; bulk iters p50/p90/max = '
      f'{np.percentile(itb,50):.0f}/{np.percentile(itb,90):.0f}/{itb.max()}; '
      f'infeas32 {np.mean(np.asarray(out[2])):.3f} ovf {np.mean(np.asarray(out[3])):.3f}', flush=True)

# bulk with a reduced cap (how much of the tail is the lockstep cost?)
@jax.jit
def bulk_cap64(ths):
    th32 = ths.astype(jnp.float32)
    du_t = arr.du + jnp.dot(th32, arr.Dth.T, precision=P)
    dl_t = arr.dl + jnp.dot(th32, arr.Dth.T, precision=P)
    st, ovf = jax.vmap(
        lambda dut, dlt: _active_set_loop_ciu(
            arr, dut, dlt, arr.is_eq, arr.is_immutable,
            jnp.zeros(m, jnp.float32), arr.is_eq, jnp.ones(m, bool),
            s_max=s_max, max_iter=64,
            primal_tol=e.primal_tol, sign_tol=e.sign_tol)
    )(du_t, dl_t)
    return st.lam, st.done

out2 = bulk_cap64(ths); out2[0].block_until_ready()
t0 = time.perf_counter()
for _ in range(3):
    out2 = bulk_cap64(ths)
out2[0].block_until_ready()
t_b64 = (time.perf_counter() - t0) / 3
print(f'bulk cap=64: {t_b64*1e3:.0f} ms/batch; done frac {np.mean(np.asarray(out2[1])):.4f}', flush=True)
