import time
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
B = 32768
xb = jnp.asarray(rng.standard_normal((B, 7)), jnp.float32)
A = jnp.asarray(rng.standard_normal((5, 7)), jnp.float32)

ident = jax.jit(lambda x: x + 0.0)
mm = jax.jit(lambda x: x @ A.T)
ident(xb).block_until_ready()
mm(xb).block_until_ready()  # trigger slow mode

t0 = time.perf_counter()
ident(xb).block_until_ready()
print(f"slow-mode single ident: {(time.perf_counter()-t0)*1e3:.2f} ms", flush=True)

for n in (10, 100):
    x = xb
    t0 = time.perf_counter()
    for _ in range(n):
        x = ident(x)
    x.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"slow-mode {n} chained idents: total {dt*1e3:.2f} ms -> {dt/n*1e3:.3f} ms/call", flush=True)

# chained matmuls (the real workload shape)
mm2 = jax.jit(lambda x: (x @ A.T) @ A)  # (B,7)->(B,5)->(B,7)
mm2(xb).block_until_ready()
for n in (10, 50):
    x = xb
    t0 = time.perf_counter()
    for _ in range(n):
        x = mm2(x)
    x.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"slow-mode {n} chained matmul-programs: total {dt*1e3:.2f} ms -> {dt/n*1e3:.3f} ms/call", flush=True)

# independent (non-chained) executions
xs = [jnp.asarray(rng.standard_normal((B, 7)), jnp.float32) for _ in range(16)]
t0 = time.perf_counter()
outs = [mm2(x) for x in xs]
for o in outs:
    o.block_until_ready()
dt = time.perf_counter() - t0
print(f"slow-mode 16 independent matmul-programs: total {dt*1e3:.2f} ms -> {dt/16*1e3:.3f} ms/call", flush=True)
