import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)


def bench(name, fn, *a):
    out = fn(*a)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"{name}: min {min(ts)*1e3:.2f} ms  median {np.median(ts)*1e3:.2f} ms", flush=True)


for shape in [(128,), (32768, 7), (7, 32768), (32768, 128), (5, 32768), (32768, 5)]:
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    bench(f"x+1 on {shape}", f, x)

# matmul with (B,7) input vs pre-transposed (7,B) input
B = 32768
A = jnp.asarray(rng.standard_normal((5, 7)), jnp.float32)
xb = jnp.asarray(rng.standard_normal((B, 7)), jnp.float32)
xt = jnp.asarray(rng.standard_normal((7, B)), jnp.float32)
bench("matmul (B,7)@(7,5)", jax.jit(lambda x: x @ A.T), xb)
bench("matmul (5,7)@(7,B)", jax.jit(lambda x: A @ x), xt)
bench("reduce sum (B,7)", jax.jit(lambda x: jnp.sum(x, axis=1)), xb)
bench("reduce sum (7,B)", jax.jit(lambda x: jnp.sum(x, axis=0)), xt)
bench("pass-through slice (B,7)", jax.jit(lambda x: x[:, :5]), xb)
bench("identity+0 (B,7)", jax.jit(lambda x: x + 0.0), xb)

# f64 involvement?
xb64 = jnp.asarray(rng.standard_normal((B, 7)), jnp.float64)
bench("x+1 on (B,7) f64", jax.jit(lambda x: x + 1.0), xb64)
bench("astype f32 (B,7) f64->f32", jax.jit(lambda x: x.astype(jnp.float32) + 1.0), xb64)
