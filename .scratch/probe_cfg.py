import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update('jax_platforms','cpu')
jax.config.update('jax_enable_x64', True)
import numpy as np, jax.numpy as jnp, linearmpc_tpu as lmpc
from linearmpc_tpu.rollout import build_rollout

for Np, Nc in ((50, 8), (30, 5), (40, 8), (30, 8)):
    mpc_l, _ = lmpc.mpc_examples("invpend", Np, Nc)
    mpc_l.add_constraint(Ax=np.eye(4), lb=-18*np.ones(4), ub=18*np.ones(4), ks=range(2, 12))
    mpc_l.setup()
    roll = build_rollout(mpc_l)
    rng = np.random.default_rng(1234)
    B, N = 16, 500
    x0 = rng.uniform(-0.25, 0.25, (B, 4))
    res = roll(x0, np.zeros((B,2)), None, N=N)
    st = np.asarray(res.status); xs = np.asarray(res.xs)
    print(f'Np={Np} Nc={Nc} m={mpc_l.engine.ldp.m}: conv {(st==1).mean():.4f} '
          f'max|x| @300/499: {np.max(np.abs(xs[:,300,:])):.3g} {np.max(np.abs(xs[:,499,:])):.3g}', flush=True)
