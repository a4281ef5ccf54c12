"""Render checkpoint/resume: film + progress state.

The reference's nearest mechanism is the interrupt system
(capture-intermediate / pause / resume, reference src/scene/render.cpp:
306-368) — partial films are developable at any spp. Here the film and the
sampling cursor are serialized to an npz so a preempted render resumes
bit-exactly: the counter-based RNG keys every path by (pixel, sample), so
continuing from (spp_done) reproduces the remaining stream exactly.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from wave_tracer_tpu.sensor.film import Film

FORMAT_VERSION = 1


def save_checkpoint(path: str, film: Film, spp_done: int, seed: int,
                    sensor_id: str = ""):
    np.savez_compressed(
        path,
        version=FORMAT_VERSION,
        value=np.asarray(film.value),
        weight=np.asarray(film.weight),
        direct=np.asarray(film.direct),
        rfilter_sigma=film.rfilter_sigma,
        radius=film.radius,
        spp_done=spp_done,
        seed=seed,
        sensor_id=sensor_id)


def load_checkpoint(path: str):
    """Returns (film, spp_done, seed, sensor_id)."""
    z = np.load(path, allow_pickle=False)
    if int(z["version"]) != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {z['version']}")
    film = Film(value=jnp.asarray(z["value"]),
                weight=jnp.asarray(z["weight"]),
                direct=jnp.asarray(z["direct"]),
                rfilter_sigma=float(z["rfilter_sigma"]),
                radius=int(z["radius"]))
    return film, int(z["spp_done"]), int(z["seed"]), str(z["sensor_id"])
