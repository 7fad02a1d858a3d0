import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

B = 32768
m = 5
rng = np.random.default_rng(0)
th32 = jnp.asarray(rng.uniform(-20, 20, (B, 7)), jnp.float32)
Dth32 = jnp.asarray(rng.standard_normal((m, 7)), jnp.float32)
du32 = jnp.asarray(rng.standard_normal(m), jnp.float32)
tbl = jnp.asarray(rng.standard_normal((2**m, m, m)), jnp.float32)


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


@jax.jit
def f_matmul(th32):
    return du32 + th32 @ Dth32.T

bench("matvec du_t (B,7)@(7,5)", f_matmul, th32)


@jax.jit
def f_transpose(th32):
    du_t = du32 + th32 @ Dth32.T
    return du_t.T + 0.0

bench("matvec + transpose to (5,B)", f_transpose, th32)


@jax.jit
def f_scan(th32):
    x = th32[:, :m]
    def step(c, _):
        return c * 1.0001 + 1.0, None
    y, _ = jax.lax.scan(step, x, None, length=46)
    return y

bench("scan x46 elementwise (B,5) carry", f_scan, th32)


@jax.jit
def f_gather(th32):
    idx = (jnp.abs(th32[:, 0]) * 1.5).astype(jnp.int32) % 32
    return tbl[idx]

bench("gather (B,) from (32,5,5)", f_gather, th32)


@jax.jit
def f_gather_scan(th32):
    idx = (jnp.abs(th32[:, 0]) * 1.5).astype(jnp.int32) % 32
    x = th32[:, :m]
    def step(c, _):
        inv = tbl[(idx + c[:, 0].astype(jnp.int32)) % 32]
        return jnp.einsum("bij,bj->bi", inv, c), None
    y, _ = jax.lax.scan(step, x, None, length=46)
    return y

bench("scan x46 gather+einsum", f_gather_scan, th32)


# pallas: single gridless kernel call, no scan
import functools

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def tiny_kernel(a_ref, o_ref):
    o_ref[:, :] = a_ref[:, :] * np.float32(2.0)


@jax.jit
def f_pallas1(th32):
    a = th32[:, :m].T
    call = pl.pallas_call(
        tiny_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, B), jnp.float32),
    )
    return call(a)

bench("single tiny pallas call (5,B)", f_pallas1, th32)


@jax.jit
def f_pallas_scan(th32):
    a = th32[:, :m].T
    call = pl.pallas_call(
        tiny_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, B), jnp.float32),
    )
    def step(c, _):
        return call(c), None
    y, _ = jax.lax.scan(step, a, None, length=46)
    return y

bench("scan x46 tiny pallas call", f_pallas_scan, th32)
