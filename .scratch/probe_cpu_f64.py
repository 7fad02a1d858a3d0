import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update('jax_platforms','cpu')
jax.config.update('jax_enable_x64', True)
import numpy as np, jax.numpy as jnp, linearmpc_tpu as lmpc
from linearmpc_tpu.rollout import build_rollout

for Np, Nc, term in ((30, 8, False), (30, 8, True), (50, 5, False)):
    mpc_l, _ = lmpc.mpc_examples("invpend", Np, Nc)
    if term:
        mpc_l.set_terminal_cost()
    mpc_l.add_constraint(Ax=np.eye(4), lb=-18*np.ones(4), ub=18*np.ones(4), ks=range(2, 12))
    mpc_l.setup()  # f64
    roll = build_rollout(mpc_l)
    rng = np.random.default_rng(1234)
    B, N = 32, 500
    x0 = rng.uniform(-0.25, 0.25, (B, 4))
    res = roll(x0, np.zeros((B,2)), None, N=N)
    st = np.asarray(res.status); xs = np.asarray(res.xs)
    print(f'Np={Np} Nc={Nc} term={term}: conv {(st==1).mean():.4f} '
          f'max|x| @100/300/499: {np.max(np.abs(xs[:,100,:])):.3g} '
          f'{np.max(np.abs(xs[:,300,:])):.3g} {np.max(np.abs(xs[:,499,:])):.3g}', flush=True)
