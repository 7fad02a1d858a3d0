import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update('jax_enable_x64', True)
import numpy as np, jax.numpy as jnp, linearmpc_tpu as lmpc

for Np, ks_hi in ((50, 32), (63, 64)):
    mpc, _ = lmpc.mpc_examples("invpend", Np, 8)
    mpc.add_constraint(Ax=np.eye(4), lb=-18*np.ones(4), ub=18*np.ones(4), ks=range(2, ks_hi))
    mpc.setup(dtype=jnp.float32)
    e = mpc.engine
    m = e.ldp.m
    rng = np.random.default_rng(1234)
    B = 8192
    ths = jnp.asarray(np.hstack([
        rng.uniform(-8, 8, (B, 4)), rng.uniform(-8, 8, (B, 2)), rng.uniform(-2, 2, (B, 1)),
    ]), jnp.float64)
    ths.block_until_ready()
    sol = e.solve_batch(ths); sol.U.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3): sol = e.solve_batch(ths)
    sol.U.block_until_ready()
    t_full = (time.perf_counter()-t0)/3

    arr = e.arrays
    P = jax.lax.Precision.HIGHEST
    bulkf = e._ciu_bulk_pallas
    @jax.jit
    def bulk(ths):
        th32 = ths.astype(jnp.float32)
        du_t = arr.du + jnp.dot(th32, arr.Dth.T, precision=P)
        dl_t = arr.dl + jnp.dot(th32, arr.Dth.T, precision=P)
        return bulkf(arr, du_t, dl_t)
    out = bulk(ths); out[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3): out = bulk(ths)
    out[0].block_until_ready()
    t_bulk = (time.perf_counter()-t0)/3
    print(f'm={m}: full {t_full*1e3:.0f} ms, bulk {t_bulk*1e3:.0f} ms, '
          f'tier+refine {1e3*(t_full-t_bulk):.0f} ms ({100*(t_full-t_bulk)/t_full:.0f}%)', flush=True)
