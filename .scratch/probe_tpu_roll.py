import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update('jax_enable_x64', True)
import numpy as np, jax.numpy as jnp, linearmpc_tpu as lmpc
from linearmpc_tpu.rollout import build_rollout

mpc_l, _ = lmpc.mpc_examples("invpend", 30, 8)
mpc_l.add_constraint(Ax=np.eye(4), lb=-18*np.ones(4), ub=18*np.ones(4), ks=range(2, 12))
mpc_l.setup(dtype=jnp.float32)
e = mpc_l.engine
print('backend', jax.default_backend(), 'fused_iu', hasattr(e,'fused_rollout_solve_iu'), flush=True)
roll = build_rollout(mpc_l)
rng = np.random.default_rng(1234)
B, N = 512, 500
x0 = rng.uniform(-0.25, 0.25, (B, 4))
res = roll(x0, np.zeros((B,2)), None, N=N)
st = np.asarray(res.status)  # (B, N)
print('conv', (st==1).mean(), 'infeas', (st==-3).mean(), 'other', (st==-1).mean(), flush=True)
dead = (st==-3)
# latching: once dead, always dead?
lat = 0; tot = 0
for b in range(B):
    w = np.where(dead[b])[0]
    if len(w):
        tot += 1
        lat += int(dead[b, w[0]:].all())
print('lanes ever -3:', tot, 'of', B, '; latched:', lat)
if tot:
    b = np.where(dead.any(axis=1))[0][0]
    w = np.where(dead[b])[0][0]
    print('first death lane', b, 'step', w, 'status around:', st[b, max(0,w-3):w+4], 'iters around:', np.asarray(res.iters)[b, max(0,w-3):w+4])
