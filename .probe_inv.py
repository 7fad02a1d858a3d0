import numpy as np, jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from linearmpc_tpu.ops.dual_active_set import _masked_inverse

print("PLATFORM:", jax.devices()[0].platform, flush=True)
rng = np.random.default_rng(0)
m = 48
A = rng.standard_normal((m, 2*m))
M = (A @ A.T / (2*m)).astype(np.float32) + np.eye(m, dtype=np.float32)
Minv_ref = np.linalg.inv(M.astype(np.float64))

R = np.asarray(jax.jit(_masked_inverse)(jnp.asarray(M)))
print("f32 cholesky-inverse rel err:", np.max(np.abs(R - Minv_ref)) / np.max(np.abs(Minv_ref)), flush=True)

P = jax.lax.Precision.HIGHEST
@jax.jit
def ns(M, R):
    eye = jnp.eye(m, dtype=jnp.float32)
    for _ in range(2):
        MR = jnp.dot(M, R, precision=P)
        R = jnp.dot(R, 2.0 * eye - MR, precision=P)
    return R
R2 = np.asarray(ns(jnp.asarray(M), jnp.asarray(R)))
print("after NS rel err:", np.max(np.abs(R2 - Minv_ref)) / np.max(np.abs(Minv_ref)), flush=True)

# Woodbury loop building blocks on TPU: dot with HIGHEST vs default
x = rng.standard_normal(m).astype(np.float32)
d_hi = np.asarray(jax.jit(lambda R, x: jnp.dot(R, x, precision=P))(jnp.asarray(R2), jnp.asarray(x)))
d_ref = Minv_ref @ x.astype(np.float64)
print("R@x HIGHEST err:", np.max(np.abs(d_hi - d_ref)) / np.max(np.abs(d_ref)), flush=True)
d_def = np.asarray(jax.jit(lambda R, x: R @ x)(jnp.asarray(R2), jnp.asarray(x)))
print("R@x default err:", np.max(np.abs(d_def - d_ref)) / np.max(np.abs(d_ref)), flush=True)
