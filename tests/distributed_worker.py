"""Worker process for the 2-process jax.distributed CPU test
(tests/test_distributed.py). Each process owns 2 virtual CPU devices; the
global (dp=4, mp=1) mesh spans both processes, so the dp axis crosses the
process boundary -- the single-host stand-in for DCN (SURVEY.md section 2.3).

Usage: python tests/distributed_worker.py <process_id> <coordinator>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()


def main():
    process_id = int(sys.argv[1])
    coordinator = sys.argv[2]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from linearmpc_tpu.parallel.distributed import (
        initialize, make_global_mesh, shard_batch_across_hosts)

    initialize(coordinator_address=coordinator, num_processes=2,
               process_id=process_id)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2

    import numpy as np

    import linearmpc_tpu as lmpc
    from linearmpc_tpu.ops.reference_solver import solve_ldp_numpy

    mesh = make_global_mesh(mp=1)
    assert mesh.shape["dp"] == 4

    # setup must work WITHOUT pinning a default device: library-internal
    # host-side jax use (host_jacobian) is required to pick process-local
    # devices itself under multi-process execution
    mpc, _ = lmpc.mpc_examples("invpend", 50, 5)
    mpc.setup()
    engine = mpc.engine

    # every process contributes its own local quarter of the global batch
    rng = np.random.default_rng(1234 + process_id)
    B_local = 8
    local = np.hstack([
        rng.uniform(-10, 10, (B_local, 4)), rng.uniform(-10, 10, (B_local, 2)),
        rng.uniform(-1, 1, (B_local, 1)),
    ])
    thetas = shard_batch_across_hosts(mesh, local)
    assert thetas.shape[0] == 16  # global batch

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from linearmpc_tpu.ops.dual_active_set import solve_single

    arrays, kw = engine.arrays, dict(engine._solve_kw)
    fn = jax.jit(
        jax.vmap(lambda th: solve_single(arrays, th, **kw).U),
        in_shardings=NamedSharding(mesh, P("dp", None)),
        out_shardings=NamedSharding(mesh, P("dp", None)),
    )
    U = fn(thetas)
    U.block_until_ready()

    # each process checks its addressable shards against the NumPy oracle
    full_local = np.concatenate(
        [np.asarray(s.data) for s in sorted(U.addressable_shards, key=lambda s: s.index[0].start)]
    )
    assert full_local.shape[0] == B_local
    for i in range(B_local):
        U_ref, *_r, s = solve_ldp_numpy(engine.ldp, local[i])
        if s == 1:
            assert np.max(np.abs(full_local[i] - U_ref)) < 1e-8, i

    # a cross-process collective must actually ride the distributed backend
    from jax.experimental import multihost_utils

    total = multihost_utils.process_allgather(np.asarray([B_local]))
    assert int(np.sum(total)) == 16

    print(f"worker {process_id} OK", flush=True)


if __name__ == "__main__":
    main()
