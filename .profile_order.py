import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
B = 32768


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


xb = jnp.asarray(rng.standard_normal((B, 7)), jnp.float32)
A = jnp.asarray(rng.standard_normal((5, 7)), jnp.float32)

ident = jax.jit(lambda x: x + 0.0)
mm = jax.jit(lambda x: x @ A.T)

bench("identity BEFORE matmul", ident, xb)
bench("matmul first time", mm, xb)
bench("identity AFTER matmul", ident, xb)
bench("matmul again", mm, xb)

# does a fresh identity on a fresh array recover?
xc = jnp.asarray(rng.standard_normal((B, 7)), jnp.float32)
bench("fresh identity fresh array", jax.jit(lambda x: x + 0.5), xc)
