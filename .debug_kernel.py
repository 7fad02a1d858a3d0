import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_enable_x64', True)
import linearmpc_tpu as lmpc
from linearmpc_tpu.ops.pallas_polish import make_polish_data, polish_pallas
from linearmpc_tpu.ops.ldp import precompute_subset_inverses

mpc, _ = lmpc.mpc_examples('invpend')
mpc.setup(dtype=jnp.float32)
e = mpc.engine
rng = np.random.default_rng(0)
B = 256
th = np.hstack([rng.uniform(-20,20,(B,4)), rng.uniform(-20,20,(B,2)), rng.uniform(-2,2,(B,1))])
th = jnp.asarray(th, jnp.float64)
sol = e.solve_batch(th)
act = jnp.asarray(np.asarray(sol.active))
side = jnp.asarray(np.asarray(sol.side))
pd = make_polish_data(e.ldp, precompute_subset_inverses(e.ldp))

U_t, lam_t, fval_t, bad_t = polish_pallas(pd, th, act, side)
U_i, lam_i, fval_i, bad_i = polish_pallas(pd, th, act, side, interpret=True)
for name, a, b in [("U", U_t.to_f64(), U_i.to_f64()), ("lam", lam_t.to_f64(), lam_i.to_f64()),
                   ("fval", fval_t.to_f64(), fval_i.to_f64()), ("bad", bad_t, bad_i)]:
    a = np.asarray(a); b = np.asarray(b)
    d = np.abs(a - b)
    print(name, "max diff", d.max(), "frac wrong", float(np.mean(d.reshape(d.shape[0], -1).max(axis=-1) > 1e-6)), flush=True)
# inspect one wrong lane
dU = np.abs(np.asarray(U_t.to_f64()) - np.asarray(U_i.to_f64())).max(axis=-1)
i = int(np.argmax(dU))
print("worst lane", i, "act", np.asarray(act)[i].astype(int), "side", np.asarray(side)[i].astype(int))
print("U tpu", np.asarray(U_t.to_f64())[i])
print("U int", np.asarray(U_i.to_f64())[i])
print("lam tpu", np.asarray(lam_t.to_f64())[i])
print("lam int", np.asarray(lam_i.to_f64())[i])
