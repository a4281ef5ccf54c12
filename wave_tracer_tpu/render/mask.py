"""Sensor-visibility alpha masks.

Reference src/sensor/mask.cpp: an alpha image marking texels whose camera
rays reach scene geometry — written alongside renders as `*_masked`
variants (src/main.cpp:316-328). Here: a jitted primary-visibility pass
over subpixel rays.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from wave_tracer_tpu.accel import trace as trace_mod
from wave_tracer_tpu.sampling import rng

BIG = 1e30


def render_mask(built, sensor, subsamples: int = 4, seed: int = 0,
                batch: int = 1 << 16) -> np.ndarray:
    """(H, W) alpha in [0,1]: fraction of subpixel rays that hit."""
    geo = built.data.geo
    W, H = sensor.width, sensor.height
    npix = W * H
    base_key = rng.make_base_key(seed)

    @jax.jit
    def kern(p0):
        pix = p0 + jnp.arange(batch, dtype=jnp.int32)
        live = pix < npix
        pix = jnp.where(live, pix, 0)
        pxy = jnp.stack([pix % W, pix // W], axis=-1)
        acc = jnp.zeros((batch,), jnp.float32)
        for s in range(subsamples):
            sid = jnp.full((batch,), s, jnp.int32)
            keys = rng.sample_key(base_key, pix, sid)
            jit_u = rng.uniform(keys, rng.D_PIXEL_JITTER, 2)
            ro, rd, _ = sensor.generate_rays(pxy, jit_u)
            _, tri, _, _ = trace_mod.trace(
                geo, ro, rd, jnp.full((batch,), 1e-6),
                jnp.full((batch,), BIG),
                jnp.full((batch,), -1, jnp.int32))
            acc = acc + (tri >= 0).astype(jnp.float32)
        return acc / subsamples, live

    out = np.zeros(npix, np.float32)
    for p0 in range(0, npix, batch):
        a, live = kern(jnp.asarray(p0))
        n = min(batch, npix - p0)
        out[p0:p0 + n] = np.asarray(a)[:n]
    return out.reshape(H, W)
