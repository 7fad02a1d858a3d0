import numpy as np, jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import linearmpc_tpu as lmpc
from linearmpc_tpu.ops.dual_active_set import _active_set_loop_iu

print("PLATFORM:", jax.devices()[0].platform, flush=True)
mpc, _ = lmpc.mpc_examples("invpend", 30, 8)
mpc.add_constraint(Ax=np.eye(4), lb=-18 * np.ones(4), ub=18 * np.ones(4), ks=range(2, 12))
mpc.setup(dtype=jnp.float32)
e = mpc.engine
arr = e.arrays
hi = e.arrays_hi
m = e.ldp.m
rng = np.random.default_rng(0)
B = 1024
th = np.hstack([rng.uniform(-12,12,(B,4)), rng.uniform(-12,12,(B,2)), rng.uniform(-2,2,(B,1))])
th64 = jnp.asarray(th, jnp.float64)

@jax.jit
def bulk(thetas):
    th32 = thetas.astype(jnp.float32)
    du_t = arr.du + th32 @ arr.Dth.T
    dl_t = dl = arr.dl + th32 @ arr.Dth.T
    lam0 = jnp.zeros((thetas.shape[0], m), jnp.float32)
    act0 = jnp.broadcast_to(arr.is_eq, (thetas.shape[0], m))
    side0 = jnp.ones((thetas.shape[0], m), bool)
    st, R = jax.vmap(lambda a,b,c,d,f: _active_set_loop_iu(
        arr, a, b, arr.is_eq, arr.is_immutable, c, d, f,
        max_iter=164, primal_tol=e.primal_tol, sign_tol=e.sign_tol, return_R=True))(
        du_t, dl_t, lam0, act0, side0)
    return st, R

st, R = bulk(th64)
done = np.asarray(st.done); act = np.asarray(st.active)
print("bulk done frac:", done.mean(), "mean iters:", float(np.mean(np.asarray(st.iters))), flush=True)

# check R quality on a done lane and a not-done lane
Gs = np.asarray(e.ldp.G) + np.diag(np.asarray(e.ldp.rho_soft))
Gs = Gs + 100*m*np.finfo(np.float32).eps*np.eye(m)
for name, mask in (("done", done), ("undone", ~done)):
    ids = np.where(mask)[0]
    if len(ids) == 0: continue
    i = ids[0]
    a = act[i].astype(float)
    M = Gs * np.outer(a, a) + np.diag(1 - a)
    Rtrue = np.linalg.inv(M)
    err = np.max(np.abs(np.asarray(R[i]) - Rtrue)) / np.max(np.abs(Rtrue))
    print(f"lane {i} ({name}): |R - Minv| rel = {err:.2e}, nactive = {int(a.sum())}", flush=True)

# run same bulk on CPU for comparison
cpu = jax.devices("cpu")
