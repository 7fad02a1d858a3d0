import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_enable_x64', True)
import linearmpc_tpu as lmpc
from linearmpc_tpu.rollout import build_rollout

mpc, _ = lmpc.mpc_examples('invpend')
mpc.setup(dtype=jnp.float32)
rollout = build_rollout(mpc)

rng = np.random.default_rng(3)
B, N = 128, 100
x0s = rng.uniform(-0.5, 0.5, (B, 4))
rs = np.zeros((B, 2))
res_f = rollout(x0s, rs, None, N=N)          # fused (B%128==0)
res_o = rollout(x0s[:127], rs[:127], None, N=N)  # old path (B=127)
us_f = np.asarray(res_f.us)[:127]
us_o = np.asarray(res_o.us)
d = np.abs(us_f - us_o)[:, :, 0]
print('max |fused - old|:', d.max(), flush=True)
lane, step = np.unravel_index(np.argmax(d), d.shape)
print('worst lane', lane, 'first big step:', np.argmax(d[lane] > 1e-4), flush=True)
print('us fused lane:', us_f[lane, :12, 0], flush=True)
print('us old   lane:', us_o[lane, :12, 0], flush=True)
print('per-step max err:', [f"{d[:, k].max():.1e}" for k in range(0, 20)], flush=True)
it_f = np.asarray(res_f.iters)[:127]
it_o = np.asarray(res_o.iters)
print('iters fused lane:', it_f[lane, :12], flush=True)
print('iters old   lane:', it_o[lane, :12], flush=True)
