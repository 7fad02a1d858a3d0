import functools
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_enable_x64', True)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 256
def mk(prec):
    def k(a_ref, x_ref, o_ref):
        o_ref[:, :] = jnp.dot(a_ref[:, :], x_ref[:, :], preferred_element_type=jnp.float32,
                              precision=prec)
    @jax.jit
    def f(a, x):
        return pl.pallas_call(k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((5, B), jnp.float32))(a, x)
    return f

rng = np.random.default_rng(0)
a = jnp.asarray(1.0 + rng.standard_normal((5, 5)) * 0.01, jnp.float32)
x = jnp.asarray(1.0 + rng.standard_normal((5, B)) * 0.01, jnp.float32)
ref = np.asarray(a, np.float64) @ np.asarray(x, np.float64)
for prec in [None, jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST]:
    out = np.asarray(mk(prec)(a, x), np.float64)
    rel = np.max(np.abs(out - ref) / np.abs(ref))
    print(f"precision={prec}: max rel err {rel:.3e}", flush=True)

# ones expansion: ones(5,1) @ row(1,B) of arbitrary values
onesc = jnp.ones((5, 1), jnp.float32)
row = jnp.asarray(1.0 + rng.standard_normal((1, B)) * 0.01, jnp.float32)
def mk2(prec):
    def k(o1, r, o_ref):
        o_ref[:, :] = jnp.dot(o1[:, :], r[:, :], preferred_element_type=jnp.float32, precision=prec)
    @jax.jit
    def f(o1, r):
        return pl.pallas_call(k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((5, B), jnp.float32))(o1, r)
    return f
for prec in [None, jax.lax.Precision.HIGHEST]:
    out = np.asarray(mk2(prec)(onesc, row))
    exact = np.broadcast_to(np.asarray(row), (5, B))
    print(f"ones-expand precision={prec}: exact={np.array_equal(out, exact)}", flush=True)
