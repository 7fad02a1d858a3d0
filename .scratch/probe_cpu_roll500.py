import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update('jax_platforms','cpu')
jax.config.update('jax_enable_x64', True)
import numpy as np, jax.numpy as jnp, linearmpc_tpu as lmpc
from linearmpc_tpu.rollout import build_rollout

mpc_l, _ = lmpc.mpc_examples("invpend", 30, 8)
mpc_l.add_constraint(Ax=np.eye(4), lb=-18*np.ones(4), ub=18*np.ones(4), ks=range(2, 12))
mpc_l.setup(dtype=jnp.float32)
roll = build_rollout(mpc_l)
rng = np.random.default_rng(1234)
B, N = 128, 500
x0 = rng.uniform(-0.25, 0.25, (B, 4))
res = roll(x0, np.zeros((B,2)), None, N=N)
st = np.asarray(res.status); xs = np.asarray(res.xs)
print('conv', (st==1).mean(), 'infeas', (st==-3).mean(), 'other', (st==-1).mean())
print('max|x| per step quartiles at k=100,300,499:',
      [float(np.max(np.abs(xs[:,k,:]))) for k in (100,300,499)])
dead = (st==-3)
if dead.any():
    b = np.where(dead.any(axis=1))[0][0]; w = np.where(dead[b])[0][0]
    print('lane', b, 'dies at', w, 'x there:', xs[b, w], 'u around:', np.asarray(res.us)[b, max(0,w-3):w+2,0])
