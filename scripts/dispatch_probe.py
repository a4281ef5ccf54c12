"""Dispatch-overhead probe: where do the bench's ~0.5s/dispatch go?

The tpu_probe measured the classical kernel at 68k paths/s in isolation,
but bench.py (render_scene, unfused) reports 22.4k. This probe times the
real render path piece by piece on the axon TPU:

  kern_chain   — N back-to-back render-kernel dispatches, block at end
  kern_block   — N dispatches, block_until_ready after EVERY one
  kern_scalar  — N dispatches with a fresh jnp.asarray(bi) scalar upload
  render16     — render_scene exactly as bench.py calls it
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from wave_tracer_tpu.render import render_scene
from wave_tracer_tpu.render.renderer import make_render_kernel
from wave_tracer_tpu.sampling import rng
from wave_tracer_tpu.scene import build_scene
from wave_tracer_tpu.scene.xml import load_scene_xml
from wave_tracer_tpu.sensor import film as film_mod

LANES = 1 << 14
REPS = 8


def main():
    print("devices:", jax.devices(), flush=True)
    scene = load_scene_xml("/root/reference/scenes/cornell-box/box.xml",
                           {"res": "256", "spp": "16"})
    scene.integrator.max_depth = 8
    scene.integrator.type = "plt_path"
    scene.integrator.fsd = False
    built = build_scene(scene)
    data = built.data.replace(spectral=built.spectral_per_sensor[0])
    sensor = scene.sensors[0]
    eps = 1e-4 * scene.world_radius()

    W, H = sensor.width, sensor.height
    film = film_mod.make_film(W, H, sensor.response.channels,
                              sensor.rfilter_sigma)
    base_key = rng.make_base_key(0)
    kern = make_render_kernel(sensor, 8, eps, True, False)

    pix_cap = 1024
    spp_cap = 16
    npix = jnp.asarray(W * H)
    s0 = jnp.asarray(0)
    sc = jnp.asarray(16)

    # warm up compile
    film, kst = kern(data, film, base_key, npix, 1, pix_cap, s0, sc,
                     spp_cap, b0=jnp.asarray(0))
    jax.block_until_ready(film.value)

    # ---- chained dispatches, block once
    t0 = time.perf_counter()
    for bi in range(REPS):
        film, kst = kern(data, film, base_key, npix, 1, pix_cap, s0, sc,
                         spp_cap, b0=jnp.asarray(bi))
    jax.block_until_ready(film.value)
    dt = (time.perf_counter() - t0) / REPS
    print(f"PROBE kern_chain {dt:.4f} ({LANES/dt:.0f} paths/s)", flush=True)

    # ---- blocking after each dispatch
    t0 = time.perf_counter()
    for bi in range(REPS):
        film, kst = kern(data, film, base_key, npix, 1, pix_cap, s0, sc,
                         spp_cap, b0=jnp.asarray(bi))
        jax.block_until_ready(film.value)
    dt = (time.perf_counter() - t0) / REPS
    print(f"PROBE kern_block {dt:.4f} ({LANES/dt:.0f} paths/s)", flush=True)

    # ---- host-staged scalar upload alone
    t0 = time.perf_counter()
    for bi in range(REPS):
        x = jnp.asarray(bi)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / REPS
    print(f"PROBE scalar_upload {dt:.4f}", flush=True)

    # ---- the real bench path
    t0 = time.perf_counter()
    img, stats = render_scene(built, spp=16, batch_lanes=LANES,
                              fuse_batches=False)
    dt = time.perf_counter() - t0
    print(f"PROBE render16 {dt:.4f} ({stats['paths_per_sec']:.0f} "
          f"paths/s reported)", flush=True)
    assert np.isfinite(img).all()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
