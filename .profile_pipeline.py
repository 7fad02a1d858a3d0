import os
import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

import linearmpc_tpu as lmpc

DS = os.environ.get("LINEARMPC_TPU_DS", "1")
mpc, _ = lmpc.mpc_examples("invpend")
mpc.setup(dtype=jnp.float32)
e = mpc.engine
rng = np.random.default_rng(0)
B = 32768
K = 16
batches = [
    jnp.asarray(
        np.hstack([
            rng.uniform(-20, 20, (B, 4)),
            rng.uniform(-20, 20, (B, 2)),
            rng.uniform(-2, 2, (B, 1)),
        ]),
        jnp.float64,
    )
    for _ in range(K)
]
# warm-up / compile
e.solve_batch(batches[0]).U.block_until_ready()

# serialized (per-batch block): what bench.py used to measure
t0 = time.perf_counter()
for b in batches[:4]:
    e.solve_batch(b).U.block_until_ready()
ser = (time.perf_counter() - t0) / 4
print(f"DS={DS} serialized: {ser*1e3:.2f} ms/batch -> {B/ser:,.0f} solves/s", flush=True)

# pipelined (enqueue all, block once): hides the tunnel RTT
for trial in range(3):
    t0 = time.perf_counter()
    outs = [e.solve_batch(b) for b in batches]
    for o in outs:
        o.U.block_until_ready()
    pip = (time.perf_counter() - t0) / K
    print(f"DS={DS} pipelined x{K}: {pip*1e3:.2f} ms/batch -> {B/pip:,.0f} solves/s", flush=True)
