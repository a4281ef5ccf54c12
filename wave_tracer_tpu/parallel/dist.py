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

    Returns step(data, film, base_key, pxy, jitter, sids, live) → film
    where the lane arrays (pxy, jitter, sids, live) are sharded over
    `axis` and the returned film is fully reduced (replicated). `live`
    masks padding lanes (lane counts must divide the mesh size; hosts
    pad the final chunk).
    """

    def local_step(data, film, base_key, pxy, jit_u, sids, live):
        pos, values, ok = trace_paths(
            data, pxy, jit_u, base_key, sids, sensor=sensor,
            max_depth=max_depth, eps=eps, mis=mis)
        local = film_mod.splat(_zero_like_film(film), pos, values,
                               ok & live)
        return _merge_psum(film, local, axis)

    shmapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_rep=False)
    return jax.jit(shmapped, donate_argnums=(1,))


def sharded_wave_step(mesh: Mesh, sensor, max_depth: int, eps: float,
                      mis: bool = True, fsd: bool = True,
                      axis: str = "dp"):
    """Sharded wave-transport (plt_path) render step: lanes over the DP
    axis, scene/edge tables replicated, film psum (the flagship kernel of
    BASELINE's beams/s metric — SURVEY §2.16/§5.8)."""

    def local_step(data, film, base_key, pxy, jit_u, sids, live):
        pos, values, ok = trace_paths_wave(
            data, pxy, jit_u, base_key, sids, sensor=sensor,
            edge_table=data.edges, max_depth=max_depth, eps=eps, mis=mis,
            fsd=fsd)
        local = film_mod.splat(_zero_like_film(film), pos, values,
                               ok & live)
        return _merge_psum(film, local, axis)

    shmapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis)),
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


def render_distributed(built, sensor_index: int = 0,
                       spp: int | None = None,
                       lanes_per_device: int = 1 << 13, seed: int = 0,
                       progress=None, axis: str = "dp"):
    """Distributed render driver — the product path behind the CLI's
    ``--distributed`` flag (SURVEY §5.8; the reference is single-node,
    its TODO.md lists distributed rendering as unimplemented).

    Every host runs this same function after
    ``launch.initialize_distributed()``: one global DP mesh spans all
    devices, each host feeds its local lane shard
    (``launch.shard_host_lanes``), the per-chip partial films psum-merge
    inside the sharded step, and the returned film is replicated — the
    caller (CLI) writes outputs on process 0 only.

    Returns (image ndarray, stats dict) like Renderer.render_sensor.
    """
    import time
    from wave_tracer_tpu.parallel import launch as launch_mod
    from wave_tracer_tpu.sampling import rng
    from wave_tracer_tpu.sensor.virtual_plane import VirtualPlaneSensor

    scene = built.scene
    sensor = scene.sensors[sensor_index]
    spp = spp or sensor.samples
    data = built.data.replace(
        spectral=built.spectral_per_sensor[sensor_index])
    cfg = scene.integrator
    eps = 1e-4 * scene.world_radius()
    n_edges = int(data.edges.count)
    fsd_on = (cfg.fsd and not getattr(sensor, "ray_trace_only", False)
              and not cfg.ray_trace_only and n_edges > 0)

    mesh = launch_mod.global_mesh(axis)
    ndev = mesh.devices.size
    nproc = jax.process_count()
    W, H = sensor.width, sensor.height
    C = sensor.response.channels \
        * (4 if getattr(sensor, "polarimetric", False) else 1)
    film = film_mod.make_film(W, H, C, sensor.rfilter_sigma)
    base_key = rng.make_base_key(seed)

    forward = isinstance(sensor, VirtualPlaneSensor)
    bdpt = (not forward and cfg.type == "plt_bdpt" and fsd_on)
    wave = (not forward and fsd_on and not bdpt)
    if forward:
        fsd_mode = "fraunhofer" if cfg.type == "plt_bdpt" else "utd"
        step = sharded_forward_step(mesh, sensor, cfg.max_depth, eps,
                                    fsd=fsd_on, fsd_mode=fsd_mode,
                                    axis=axis)
        mode = "forward-dist"
    elif bdpt:
        step = sharded_bdpt_step(mesh, sensor,
                                 min(cfg.max_depth, 16), eps,
                                 fsd=fsd_on, axis=axis)
        mode = "bdpt-dist"
    elif wave:
        step = sharded_wave_step(mesh, sensor, cfg.max_depth, eps,
                                 mis=cfg.mis, fsd=True, axis=axis)
        mode = "wave-dist"
    else:
        step = sharded_render_step(mesh, sensor, cfg.max_depth, eps,
                                   mis=cfg.mis, axis=axis)
        mode = "ray-dist"

    # lane schedule: global lane ids sweep (pixel, sample) pairs in
    # chunks of lanes_per_device·ndev; every host materialises ITS
    # contiguous slice and the launch helper assembles the global arrays
    total = W * H * spp
    # chunk = one launch; capped to the render size (rounded up to a
    # mesh-divisible lane count) so tiny renders don't pad to the full
    # per-device budget
    chunk = min(lanes_per_device * ndev,
                -(-total // ndev) * ndev)
    pid = jax.process_index()
    t0 = time.time()
    done = 0
    for c0 in range(0, total, chunk):
        n_live = min(chunk, total - c0)
        per_host = chunk // max(nproc, 1)
        lo = c0 + pid * per_host
        gid = np.arange(lo, lo + per_host, dtype=np.int64)
        live_h = gid < c0 + n_live
        gid = np.where(live_h, gid, c0)      # clamp padding lanes
        pix_h = (gid % (W * H)).astype(np.int32)
        sid_h = (gid // (W * H)).astype(np.int32)
        if forward:
            (lane_ids, sids, live) = launch_mod.shard_host_lanes(
                mesh, (gid.astype(np.int32), sid_h, live_h), axis)
            film = step(data, film, base_key, lane_ids, sids, live)
        else:
            pxy_h = np.stack([pix_h % W, pix_h // W], axis=-1)
            (pxy, sids, live) = launch_mod.shard_host_lanes(
                mesh, (pxy_h.astype(np.int32), sid_h, live_h), axis)
            pix = pxy[:, 1] * W + pxy[:, 0]
            jit_u = rng.uniform(rng.sample_key(base_key, pix, sids),
                                rng.D_PIXEL_JITTER, 2)
            film = step(data, film, base_key, pxy, jit_u, sids, live)
        done += n_live
        if progress and launch_mod.is_main_process():
            progress(min(done // (W * H), spp), spp)
    film.value.block_until_ready()
    launch_mod.sync_hosts("render-done")
    dt = time.time() - t0
    direct_norm = spp if (bdpt or forward) else 0.0
    if forward:
        direct_norm = done / float(W * H)
    img = np.asarray(film_mod.develop(film, direct_norm))
    stats = dict(seconds=dt, paths=done,
                 paths_per_sec=done / max(dt, 1e-9), mode=mode,
                 spp_done=spp, interrupted=False,
                 devices=int(ndev), processes=int(nproc))
    return img, stats


def sharded_bdpt_step(mesh: Mesh, sensor, max_depth: int, eps: float,
                      fsd: bool = True, axis: str = "dp"):
    """Sharded bidirectional step: camera-strategy splats and t=1
    light-tracing splats both psum-merged."""

    def local_step(data, film, base_key, pxy, jit_u, sids, live):
        pos, values, ok, (lt_pos, lt_val, lt_ok) = trace_bdpt(
            data, pxy, jit_u, base_key, sids, sensor=sensor,
            max_depth=max_depth, eps=eps, fsd=fsd)
        local = film_mod.splat(_zero_like_film(film), pos, values,
                               ok & live)
        rep = lt_ok.shape[0] // live.shape[0]
        lt_live = jnp.repeat(live, rep) if rep > 1 else live
        local = film_mod.splat_direct(local, lt_pos, lt_val,
                                      lt_ok & lt_live)
        return _merge_psum(film, local, axis)

    shmapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_rep=False)
    return jax.jit(shmapped, donate_argnums=(1,))
