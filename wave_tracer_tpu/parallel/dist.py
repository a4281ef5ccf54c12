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
from wave_tracer_tpu.integrator.plt_bdpt import trace_bdpt
from wave_tracer_tpu.integrator.plt_path import trace_paths_wave
from wave_tracer_tpu.integrator.plt_path_forward import trace_forward
from wave_tracer_tpu.sensor import film as film_mod


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]).reshape(n), (axis,))


def _zero_like_film(film):
    return film_mod.Film(
        value=jnp.zeros_like(film.value),
        weight=jnp.zeros_like(film.weight),
        direct=jnp.zeros_like(film.direct),
        rfilter_sigma=film.rfilter_sigma, radius=film.radius)


def _merge_psum(film, local, axis):
    """Merge per-shard partial films over the DP axis (ICI collective)."""
    return film.replace(
        value=film.value + jax.lax.psum(local.value, axis),
        weight=film.weight + jax.lax.psum(local.weight, axis),
        direct=film.direct + jax.lax.psum(local.direct, axis))


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
        local = film_mod.splat(_zero_like_film(film), pos, values, ok)
        return _merge_psum(film, local, axis)

    shmapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_rep=False)
    return jax.jit(shmapped, donate_argnums=(1,))


def sharded_wave_step(mesh: Mesh, sensor, max_depth: int, eps: float,
                      mis: bool = True, fsd: bool = True,
                      axis: str = "dp"):
    """Sharded wave-transport (plt_path) render step: lanes over the DP
    axis, scene/edge tables replicated, film psum (the flagship kernel of
    BASELINE's beams/s metric — SURVEY §2.16/§5.8)."""

    def local_step(data, film, base_key, pxy, jit_u, sids):
        pos, values, ok = trace_paths_wave(
            data, pxy, jit_u, base_key, sids, sensor=sensor,
            edge_table=data.edges, max_depth=max_depth, eps=eps, mis=mis,
            fsd=fsd)
        local = film_mod.splat(_zero_like_film(film), pos, values, ok)
        return _merge_psum(film, local, axis)

    shmapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_rep=False)
    return jax.jit(shmapped, donate_argnums=(1,))


def sharded_forward_step(mesh: Mesh, sensor, max_depth: int, eps: float,
                         fsd: bool = True, fsd_mode: str = "utd",
                         axis: str = "dp"):
    """Sharded forward light tracing onto a virtual-plane sensor: lanes
    over the DP axis, direct-splat light image psum-merged."""

    def local_step(data, film, base_key, lane_ids, sids, live):
        pos, values, ok, sig, nee = trace_forward(
            data, lane_ids, base_key, sids, sensor=sensor,
            edge_table=data.edges, max_depth=max_depth, eps=eps,
            fsd=fsd, fsd_mode=fsd_mode)
        local = film_mod.splat_direct_gaussian(
            _zero_like_film(film), pos, sig, values, ok & live)
        nee_pos, nee_val, nee_ok = nee
        rep = nee_ok.shape[0] // live.shape[0]
        nee_live = jnp.repeat(live, rep) if rep > 1 else live
        local = film_mod.splat_direct(local, nee_pos, nee_val,
                                      nee_ok & nee_live)
        return _merge_psum(film, local, axis)

    shmapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_rep=False)
    return jax.jit(shmapped, donate_argnums=(1,))


def sharded_bdpt_step(mesh: Mesh, sensor, max_depth: int, eps: float,
                      fsd: bool = True, axis: str = "dp"):
    """Sharded bidirectional step: camera-strategy splats and t=1
    light-tracing splats both psum-merged."""

    def local_step(data, film, base_key, pxy, jit_u, sids):
        pos, values, ok, (lt_pos, lt_val, lt_ok) = trace_bdpt(
            data, pxy, jit_u, base_key, sids, sensor=sensor,
            max_depth=max_depth, eps=eps, fsd=fsd)
        local = film_mod.splat(_zero_like_film(film), pos, values, ok)
        local = film_mod.splat_direct(local, lt_pos, lt_val, lt_ok)
        return _merge_psum(film, local, axis)

    shmapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_rep=False)
    return jax.jit(shmapped, donate_argnums=(1,))
