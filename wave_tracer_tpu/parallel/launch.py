"""Multi-host launch wiring: jax.distributed + global DP mesh.

The reference is strictly single-node (its TODO.md lists "distributed
rendering" as unimplemented; SURVEY §2.16/§5.8 mandates the TPU build
CREATE this layer). The model is the standard JAX multi-controller
launch: every host runs the same program, calls
``initialize_distributed()`` first, and then builds ONE global mesh over
all devices of the slice/pod. The sharded render steps in
``parallel.dist`` are written against the mesh only, so they run
unchanged from 1 chip to a multi-host pod:

* scene / BVH / LUT pytrees are replicated per host (small against HBM),
* beam lanes are sharded over the global ``dp`` axis — each host feeds
  its local shard via ``host_local_array_to_global_array``,
* per-chip partial films merge with a ``psum`` that rides ICI inside a
  slice and DCN across slices,
* checkpoints (film + spp cursor) are written by process 0 only.

Launch recipes
--------------
TPU pods (GKE/QR): the runtime injects coordinator/process env vars —
``initialize_distributed()`` with no arguments is enough::

    # same command on every host
    python -m wave_tracer_tpu render scene.xml -o out/ --distributed

CPU/GPU clusters or manual bring-up: pass the coordinator explicitly::

    python scripts/scaling_bench.py --distributed \
        --coordinator 10.0.0.1:8476 --process-id $RANK --num-processes 4
"""

from __future__ import annotations

import jax


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           local_device_ids=None) -> bool:
    """Bring up jax.distributed for a multi-host run.

    All arguments optional: on TPU pods the plugin discovers them from
    the environment (``jax.distributed.initialize()`` no-arg form). Safe
    to call in single-process runs — returns False without initializing
    when there is nothing to coordinate.
    """
    if num_processes is not None and num_processes <= 1 \
            and coordinator is None:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids)
        return True
    except (ValueError, RuntimeError):  # single-host fallback
        if coordinator is not None or (num_processes or 0) > 1:
            raise
        return False


def is_main_process() -> bool:
    """True on the host that should write outputs/checkpoints."""
    return jax.process_index() == 0


def global_mesh(axis: str = "dp"):
    """One DP mesh over every device in the (possibly multi-host) run."""
    import numpy as np
    from jax.sharding import Mesh
    devs = jax.devices()          # global device list under distributed
    return Mesh(np.asarray(devs).reshape(len(devs)), (axis,))


def shard_host_lanes(mesh, arrays, axis: str = "dp"):
    """Assemble global lane arrays from per-host shards.

    Each host passes ITS lanes (first-dim = global_lanes /
    process_count); returns global jax.Arrays sharded P(axis) over the
    mesh, as the sharded steps in parallel.dist expect. In single-process
    runs this is a plain device_put."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return tuple(jax.device_put(a, sharding) for a in arrays)
    from jax.experimental import multihost_utils
    return tuple(
        multihost_utils.host_local_array_to_global_array(a, mesh,
                                                         P(axis))
        for a in arrays)


def sync_hosts(name: str = "barrier"):
    """Cross-host barrier (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)
