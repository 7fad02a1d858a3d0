"""A/B the m=256 cold bulk phase under env variants (whole-phase timing,
stream discipline: enqueue 4 reps, block once)."""
import os, sys, time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


VARIANTS = [
    {},                                                            # base
    {"LINEARMPC_TPU_CIU_KSTEP": "4"},
    {"LINEARMPC_TPU_CIU_SMAX": "16", "LINEARMPC_TPU_CIU_CHUNK": "256"},
    {"LINEARMPC_TPU_CIU_SMAX": "16", "LINEARMPC_TPU_CIU_CHUNK": "256",
     "LINEARMPC_TPU_CIU_KSTEP": "4"},
    {"LINEARMPC_TPU_CIU_SMAX": "16"},
    {"LINEARMPC_TPU_CIU_CAP": "26"},
    {"LINEARMPC_TPU_CIU_SMAX": "16", "LINEARMPC_TPU_CIU_CHUNK": "256",
     "LINEARMPC_TPU_CIU_KSTEP": "4", "LINEARMPC_TPU_CIU_CAP": "26"},
]
KEYS = ["LINEARMPC_TPU_CIU_SMAX", "LINEARMPC_TPU_CIU_CHUNK",
        "LINEARMPC_TPU_CIU_KSTEP", "LINEARMPC_TPU_CIU_CAP"]

import linearmpc_tpu as lmpc

rng = np.random.default_rng(99)
B = 8192
ths = np.hstack([
    rng.uniform(-8, 8, (B, 4)), rng.uniform(-8, 8, (B, 2)),
    rng.uniform(-2, 2, (B, 1)),
])

for var in VARIANTS:
    for k in KEYS:
        os.environ.pop(k, None)
    os.environ.update(var)
    mpc, _ = lmpc.mpc_examples("invpend", 63, 8)
    mpc.add_constraint(Ax=np.eye(4), lb=-18 * np.ones(4), ub=18 * np.ones(4),
                       ks=range(2, 64))
    mpc.setup(dtype=jnp.float32)
    e = mpc.engine
    arr = e.arrays
    P = jax.lax.Precision.HIGHEST
    th32 = jnp.asarray(ths, jnp.float32)

    @jax.jit
    def bulk(th32):
        du_t = arr.du + jnp.dot(th32, arr.Dth.T, precision=P)
        dl_t = arr.dl + jnp.dot(th32, arr.Dth.T, precision=P)
        return e._ciu_bulk_pallas(arr, du_t, dl_t)

    try:
        out = bulk(th32)
        out[0].block_until_ready()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [bulk(th32) for _ in range(4)]
            outs[-1][0].block_until_ready()
            best = min(best, (time.perf_counter() - t0) / 4)
        it = np.asarray(out[3])
        cap = int(os.environ.get("LINEARMPC_TPU_CIU_CAP", "72"))
        tag = {k.replace("LINEARMPC_TPU_CIU_", ""): v for k, v in var.items()}
        log(f"{tag or 'base'}: bulk {best*1e3:.1f} ms; "
            f"iters p50={np.percentile(it,50):.0f} p99={np.percentile(it,99):.0f} "
            f"capped={np.mean(it >= cap - 1):.4f} "
            f"infeas={np.mean(np.asarray(out[4])):.4f} "
            f"ovf={np.mean(np.asarray(out[5])):.4f}")
    except Exception as ex:
        log(f"{var}: FAILED {type(ex).__name__}: {str(ex)[:300]}")
