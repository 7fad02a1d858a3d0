import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update('jax_platforms','cpu')
jax.config.update('jax_enable_x64', True)
import numpy as np, jax.numpy as jnp, linearmpc_tpu as lmpc
from linearmpc_tpu.ops.reference_solver import solve_ldp_numpy
import os
os.environ['LINEARMPC_TPU_CIU'] = '0'
mpc, _ = lmpc.mpc_examples("invpend", 30, 8)
mpc.add_constraint(Ax=np.eye(4), lb=-18*np.ones(4), ub=18*np.ones(4), ks=range(2, 12))
mpc.setup()  # f64
rng = np.random.default_rng(0)
B = 64
thetas = np.hstack([rng.uniform(-10, 10, (B, 4)), rng.uniform(-10, 10, (B, 2)), rng.uniform(-2, 2, (B, 1))])
sol = mpc.engine.solve_batch(thetas)
st = np.asarray(sol.status)
bad = np.where(st != 1)[0]
print('flagged lanes:', bad)
for i in bad[:5]:
    U_ref, *_r, s_ref = solve_ldp_numpy(mpc.engine.ldp, thetas[i])
    print(i, 'oracle status', s_ref)
