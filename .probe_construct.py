import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

which = sys.argv[1]
rng = np.random.default_rng(0)
B = 32768
xb = jnp.asarray(rng.standard_normal((B, 7)), jnp.float32)
A = jnp.asarray(rng.standard_normal((5, 7)), jnp.float32)
tbl = jnp.asarray(rng.standard_normal((32, 5, 5)), jnp.float32)


def bench(name, fn, *a):
    out = fn(*a)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"[{which}] {name}: min {min(ts)*1e3:.2f} ms", flush=True)


ident = jax.jit(lambda x: x + 0.0)
bench("ident pre", ident, xb)

if which == "ident":
    pass
elif which == "matmul":
    bench("matmul", jax.jit(lambda x: x @ A.T), xb)
elif which == "matmul_small":
    a5 = jnp.asarray(rng.standard_normal((5, 5)), jnp.float32)
    b5 = jnp.asarray(rng.standard_normal((5, 5)), jnp.float32)
    bench("matmul 5x5", jax.jit(lambda a, b: a @ b), a5, b5)
elif which == "scan_elem":
    def f(x):
        y, _ = jax.lax.scan(lambda c, _: (c * 1.0001 + 1.0, None), x, None, length=46)
        return y
    bench("scan elem", jax.jit(f), xb)
elif which == "while_elem":
    def f(x):
        def cond(s):
            return s[1] < 46
        def body(s):
            return (s[0] * 1.0001 + 1.0, s[1] + 1)
        y, _ = jax.lax.while_loop(cond, body, (x, jnp.int32(0)))
        return y
    bench("while elem", jax.jit(f), xb)
elif which == "gather":
    idx = (jnp.abs(xb[:, 0]) * 1.5).astype(jnp.int32) % 32
    bench("gather", jax.jit(lambda i: tbl[i]), idx)
elif which == "unrolled_matvec":
    def f(x):
        acc = x[:, 0:1] * A[:, 0]
        for j in range(1, 7):
            acc = acc + x[:, j : j + 1] * A[:, j]
        return acc
    bench("unrolled matvec", jax.jit(f), xb)
elif which == "reduce":
    bench("reduce", jax.jit(lambda x: jnp.sum(x, axis=1)), xb)
elif which == "pallas_tiny":
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k(a_ref, o_ref):
        o_ref[:, :] = a_ref[:, :] * np.float32(2.0)

    def f(x):
        a = x[:5, :].T if x.shape[0] == B else x
        a = x.T[:5, :]
        call = pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((5, B), jnp.float32),
        )
        return call(a)
    bench("pallas tiny", jax.jit(f), xb)
elif which == "pallas_dot":
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G5 = jnp.asarray(rng.standard_normal((5, 5)), jnp.float32)

    def k(g_ref, a_ref, o_ref):
        o_ref[:, :] = jnp.dot(g_ref[:, :], a_ref[:, :], preferred_element_type=jnp.float32)

    def f(x):
        a = x.T[:5, :]
        call = pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((5, B), jnp.float32),
        )
        return call(G5, a)
    bench("pallas dot", jax.jit(f), xb)
elif which == "dot_general_f32":
    bench("dot f32 highest", jax.jit(
        lambda x: jax.lax.dot_general(x, A.T, (((1,), (0,)), ((), ())),
                                      precision=jax.lax.Precision.HIGHEST)), xb)
else:
    raise SystemExit(f"unknown {which}")

bench("ident post", ident, xb)
