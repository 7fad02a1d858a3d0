"""Multi-host initialization and sharding helpers (ICI within a slice,
DCN across hosts).

The reference is single-process (SURVEY.md section 2.3); multi-host
execution is a created capability. The pattern:

1. every host calls :func:`initialize` (jax.distributed) at startup;
2. build a global mesh with :func:`make_global_mesh` -- the ``dp`` axis
   spans hosts (collectives ride DCN only if a logical axis crosses host
   boundaries; keep ``mp`` within a host so its collectives stay on ICI);
3. shard the scenario batch over ``dp`` with
   ``jax.make_array_from_process_local_data`` and run the same jitted
   solve/rollout -- GSPMD inserts the cross-host collectives.

Single-chip environments (this round's hardware) exercise the identical
code path on a virtual mesh (``xla_force_host_platform_device_count``).
"""

from __future__ import annotations

import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed for multi-host execution. On single-host
    setups this is a no-op (jax.distributed raises if re-initialized)."""
    import jax

    if num_processes in (None, 1):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_mesh(mp: int = 1):
    """Global (dp, mp) mesh over all processes' devices; ``mp`` should
    divide the per-host device count so model-parallel collectives stay on
    ICI."""
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    n = len(devices)
    assert n % mp == 0, f"{mp} must divide {n} devices"
    return Mesh(devices.reshape(n // mp, mp), ("dp", "mp"))


def shard_batch_across_hosts(mesh, local_batch):
    """Assemble a global batch array from per-host local shards."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("dp", *([None] * (local_batch.ndim - 1))))
    return jax.make_array_from_process_local_data(sharding, local_batch)
