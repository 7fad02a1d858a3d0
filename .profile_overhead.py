import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

f = jax.jit(lambda x: x + 1.0)
x = jnp.ones((128,), jnp.float32)
f(x).block_until_ready()
for trial in range(3):
    t0 = time.perf_counter()
    for _ in range(10):
        x = f(x)
    x.block_until_ready()
    print(f"trivial jit x10 serialized-enqueue: {(time.perf_counter()-t0)/10*1e3:.2f} ms/call", flush=True)

# blocking each call
for trial in range(2):
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        f(x).block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"trivial jit blocking: min {min(ts)*1e3:.2f} median {np.median(ts)*1e3:.2f} ms", flush=True)

# big elementwise program: 200 chained ops on (5, 32768)
def chain(x):
    for i in range(200):
        x = x * 1.0000001 + 1e-7
    return x

g = jax.jit(chain)
y = jnp.ones((5, 32768), jnp.float32)
g(y).block_until_ready()
ts = []
for _ in range(10):
    t0 = time.perf_counter()
    g(y).block_until_ready()
    ts.append(time.perf_counter() - t0)
print(f"200-op chain (5,32768): min {min(ts)*1e3:.2f} median {np.median(ts)*1e3:.2f} ms", flush=True)

# 200 NON-fusable ops? use psum-like barrier: interleave transposes to break fusion
def chain2(x):
    for i in range(100):
        x = (x * 1.0000001).T
        x = x + 1e-7
    return x

h = jax.jit(chain2)
h(y).block_until_ready()
ts = []
for _ in range(10):
    t0 = time.perf_counter()
    h(y).block_until_ready()
    ts.append(time.perf_counter() - t0)
print(f"100 transpose-broken ops: min {min(ts)*1e3:.2f} median {np.median(ts)*1e3:.2f} ms", flush=True)
