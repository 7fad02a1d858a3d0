import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_enable_x64', True)
import linearmpc_tpu as lmpc
from linearmpc_tpu.ops.reference_solver import solve_ldp_numpy
from linearmpc_tpu.rollout import build_rollout

print('PLATFORM:', jax.devices()[0].platform, flush=True)
mpc, _ = lmpc.mpc_examples('invpend')
mpc.setup(dtype=jnp.float32)
e = mpc.engine
print('fused available:', hasattr(e, 'fused_rollout_solve'), flush=True)

rollout = build_rollout(mpc)
B, N = 128, 100
rng = np.random.default_rng(3)
x0s = rng.uniform(-0.5, 0.5, (B, 4))
rs = np.zeros((B, 2))
res = rollout(x0s, rs, None, N=N)
res.us.block_until_ready()
print('converged frac:', float(np.mean(np.asarray(res.status) == 1)),
      'mean iters:', float(np.mean(np.asarray(res.iters))), flush=True)

# host f64 replication of lane 0
ldp = e.ldp
model = mpc.model
F, G = np.asarray(model.F), np.asarray(model.G)
x = x0s[0].copy()
us_ref = []
uprev = np.zeros(1)
for k in range(N):
    theta = np.concatenate([x, np.zeros(2), uprev])
    U, *_r, status = solve_ldp_numpy(ldp, theta)
    u = U[:1]
    us_ref.append(u.copy())
    uprev = u
    x = F @ x + G @ u
us_ref = np.asarray(us_ref)
us_dev = np.asarray(res.us)[0]
err = np.max(np.abs(us_dev - us_ref))
print('max |u - u_ref(f64 host)| over trajectory:', err, flush=True)

# throughput 4096 x 500
Br, Nr = 4096, 500
x0b = jnp.asarray(rng.uniform(-0.5, 0.5, (Br, 4)))
rsb = jnp.zeros((Br, 2))
x0b.block_until_ready()
res = rollout(x0b, rsb, None, N=Nr)
res.us.block_until_ready()
for _ in range(3):
    t0 = time.perf_counter()
    res = rollout(x0b, rsb, None, N=Nr)
    res.us.block_until_ready()
    dt = time.perf_counter() - t0
    print(f'fused rollout: {Br*Nr/dt:,.0f} control-steps/s ({dt:.3f}s), '
          f'mean iters {float(np.mean(np.asarray(res.iters))):.2f}, '
          f'converged {float(np.mean(np.asarray(res.status)==1)):.4f}', flush=True)
