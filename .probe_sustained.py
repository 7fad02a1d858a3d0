import time
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import linearmpc_tpu as lmpc

mpc, _ = lmpc.mpc_examples("invpend")
mpc.setup(dtype=jnp.float32)
e = mpc.engine
rng = np.random.default_rng(0)
B = 32768
K = 32
batches = []
for _ in range(K):
    th = np.hstack([rng.uniform(-20, 20, (B, 4)), rng.uniform(-20, 20, (B, 2)), rng.uniform(-2, 2, (B, 1))])
    batches.append(jnp.asarray(th, jnp.float64))
# force all input transfers to complete BEFORE timing
for b in batches:
    b.block_until_ready()

sol = e.solve_batch(batches[0])
sol.U.block_until_ready()  # compile

for trial in range(3):
    t0 = time.perf_counter()
    outs = [e.solve_batch(b) for b in batches]
    for o in outs:
        o.U.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"sustained x{K} pre-transferred: {dt/K*1e3:.2f} ms/batch -> {B*K/dt:,.0f} solves/s", flush=True)

# per-batch latency distribution inside the chain
t0 = time.perf_counter()
outs = [e.solve_batch(b) for b in batches]
outs[-1].U.block_until_ready()
dt = time.perf_counter() - t0
print(f"block only on last: {dt/K*1e3:.2f} ms/batch -> {B*K/dt:,.0f} solves/s", flush=True)
