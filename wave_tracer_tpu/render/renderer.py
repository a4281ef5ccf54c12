"""Render orchestration: batched wavefront launches into a film.

The reference's scene_renderer_t drives a thread pool over 24×24 pixel
blocks (reference include/wt/scene/scene_renderer.hpp:102,
src/scene/render.cpp:381-579). On TPU the equivalent is a jitted
mega-batch: (pixels × spp) lanes are chunked into launches sized to fill
the chip, each launch traces a full wavefront and scatter-adds into the
film carried as device state. Progressive spp accumulation keeps partial
results developable at any time (the reference's capture-intermediate
interrupt becomes 'develop whenever').
"""

from __future__ import annotations

import dataclasses
import math
import time

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from wave_tracer_tpu.integrator.path import trace_paths
from wave_tracer_tpu.sampling import rng
from wave_tracer_tpu.sensor import film as film_mod


@dataclasses.dataclass
class Renderer:
    built: object                  # BuiltScene
    batch_lanes: int = 1 << 17     # lanes per launch
    seed: int = 0

    def render_sensor(self, sensor_index: int = 0, spp: int | None = None,
                      progress=None):
        built = self.built
        scene = built.scene
        sensor = scene.sensors[sensor_index]
        spp = spp or sensor.samples
        W, H = sensor.width, sensor.height
        C = sensor.response.channels
        film = film_mod.make_film(W, H, C, sensor.rfilter_sigma)
        data = built.data.replace(
            spectral=built.spectral_per_sensor[sensor_index])

        base_key = rng.make_base_key(self.seed)
        cfg = scene.integrator
        eps = 1e-4 * scene.world_radius()

        npixels = W * H
        lanes = self.batch_lanes
        pix_per_batch = max(lanes // max(spp, 1), 1)
        pix_per_batch = min(pix_per_batch, npixels)
        spp_per_batch = max(lanes // pix_per_batch, 1)
        spp_per_batch = min(spp_per_batch, spp)

        kern = make_render_kernel(sensor, cfg.max_depth, eps, cfg.mis)

        t0 = time.time()
        total_lanes = 0
        for s0 in range(0, spp, spp_per_batch):
            s1 = min(s0 + spp_per_batch, spp)
            for p0 in range(0, npixels, pix_per_batch):
                p1 = min(p0 + pix_per_batch, npixels)
                film = kern(data, film, base_key,
                            jnp.asarray(p0), jnp.asarray(p1 - p0),
                            pix_per_batch, jnp.asarray(s0),
                            jnp.asarray(s1 - s0), s1 - s0)
                total_lanes += (p1 - p0) * (s1 - s0)
            if progress:
                progress(s1, spp)
        film.value.block_until_ready()
        dt = time.time() - t0
        img = np.asarray(film_mod.develop(film, spp))
        return img, dict(seconds=dt, paths=total_lanes,
                         paths_per_sec=total_lanes / max(dt, 1e-9))


def make_render_kernel(sensor, max_depth, eps, mis):
    """Jitted launch: trace pix_count×spp_count lanes, splat into film."""

    @partial(jax.jit, static_argnums=(5, 8),
             donate_argnums=(1,))
    def kern(data, film, base_key, p0, p_count, pix_cap, s0, s_count,
             spp_cap):
        W = sensor.width
        # lane grid: (pix_cap, spp_cap) flattened
        pix = p0 + jnp.arange(pix_cap, dtype=jnp.int32)
        live_p = jnp.arange(pix_cap, dtype=jnp.int32) < p_count
        pix = jnp.where(live_p, pix, 0)
        px = pix % W
        py = pix // W
        sids = s0 + jnp.arange(spp_cap, dtype=jnp.int32)
        live_s = jnp.arange(spp_cap, dtype=jnp.int32) < s_count

        pxy = jnp.stack(jnp.broadcast_arrays(px[:, None], py[:, None]),
                        axis=-1)
        pxy = jnp.broadcast_to(pxy, (pix_cap, spp_cap, 2)).reshape(-1, 2)
        sid = jnp.broadcast_to(sids[None, :], (pix_cap, spp_cap)).reshape(-1)
        live = jnp.broadcast_to(live_p[:, None] & live_s[None, :],
                                (pix_cap, spp_cap)).reshape(-1)

        jit_u = rng.uniform(rng.sample_key(base_key,
                                           pxy[:, 1] * W + pxy[:, 0], sid),
                            rng.D_PIXEL_JITTER, 2)
        pos, values, ok = trace_paths(
            data, pxy, jit_u, base_key, sid, sensor=sensor,
            max_depth=max_depth, eps=eps, mis=mis)
        return film_mod.splat(film, pos, values, ok & live)

    return kern


def render_scene(built, sensor_index: int = 0, spp: int | None = None,
                 batch_lanes: int = 1 << 17, seed: int = 0, progress=None):
    r = Renderer(built, batch_lanes=batch_lanes, seed=seed)
    return r.render_sensor(sensor_index, spp, progress)
