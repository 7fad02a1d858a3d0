import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_enable_x64', True)
import linearmpc_tpu as lmpc
from linearmpc_tpu.ops.reference_solver import solve_ldp_numpy

print('PLATFORM:', jax.devices()[0].platform, flush=True)
mpc, _ = lmpc.mpc_examples('invpend')
mpc.setup(dtype=jnp.float32)
e = mpc.engine
print('golden:', mpc.compute_control([5.0,5,0,0]), flush=True)

rng = np.random.default_rng(0)
B = 32768
K = 32
batches = [jnp.asarray(np.hstack([rng.uniform(-20,20,(B,4)), rng.uniform(-20,20,(B,2)), rng.uniform(-2,2,(B,1))]), jnp.float64) for _ in range(K)]
for b in batches: b.block_until_ready()
sol = e.solve_batch(batches[0]); sol.U.block_until_ready()
print('converged:', float(np.mean(np.asarray(sol.status)==1)), 'mean iters', float(np.mean(np.asarray(sol.iters))), flush=True)

# accuracy vs f64 reference
check = np.asarray(batches[0][:256], np.float64)
U_dev = np.asarray(sol.U[:256], np.float64)
err = 0.0
for i in range(256):
    U_ref, *_r, status = solve_ldp_numpy(e.ldp, check[i])
    if status == 1:
        err = max(err, float(np.max(np.abs(U_dev[i] - U_ref))))
print('max err vs f64 ref:', err, flush=True)

for trial in range(3):
    t0 = time.perf_counter()
    outs = [e.solve_batch(b) for b in batches]
    outs[-1].U.block_until_ready()
    dt = time.perf_counter() - t0
    print(f'sustained: {dt/K*1e3:.2f} ms/batch -> {B*K/dt:,.0f} solves/s', flush=True)
