"""Distributed rendering: beams sharded over a device mesh.

The reference's only parallelism is an intra-node thread pool over image
blocks (reference src/scene/render.cpp:149-172). The TPU-native design
shards the *beam lane* dimension over a data-parallel mesh axis with
shard_map: scene/BVH/LUT tables are replicated, each chip traces its lane
shard and accumulates a partial film, and partial films are merged with a
`psum` that rides ICI. Multi-host runs launch via jax.distributed with the
same code path.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from wave_tracer_tpu.integrator.path import trace_paths
from wave_tracer_tpu.sensor import film as film_mod


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]).reshape(n), (axis,))


def sharded_render_step(mesh: Mesh, sensor, max_depth: int, eps: float,
                        mis: bool = True, axis: str = "dp"):
    """Build a pjit-compiled render step over the mesh.

    Returns step(data, film, base_key, pxy, jitter, sids) → film where the
    lane arrays (pxy, jitter, sids) are sharded over `axis` and the
    returned film is fully reduced (replicated).
    """

    def local_step(data, film, base_key, pxy, jit_u, sids):
        pos, values, ok = trace_paths(
            data, pxy, jit_u, base_key, sids, sensor=sensor,
            max_depth=max_depth, eps=eps, mis=mis)
        local = film_mod.Film(
            value=jnp.zeros_like(film.value),
            weight=jnp.zeros_like(film.weight),
            direct=jnp.zeros_like(film.direct),
            rfilter_sigma=film.rfilter_sigma, radius=film.radius)
        local = film_mod.splat(local, pos, values, ok)
        # merge partial films over the DP axis (ICI collective)
        return film.replace(
            value=film.value + jax.lax.psum(local.value, axis),
            weight=film.weight + jax.lax.psum(local.weight, axis),
            direct=film.direct + jax.lax.psum(local.direct, axis))

    shmapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_rep=False)
    return jax.jit(shmapped, donate_argnums=(1,))
