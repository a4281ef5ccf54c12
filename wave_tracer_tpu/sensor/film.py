"""Film: 2D accumulation buffers with Gaussian reconstruction splats.

The reference film (reference include/wt/sensor/film/film.hpp:254-342,
film_storage.hpp:59-300) accumulates per-texel value and filter-weight sums,
splatting each sample into a window of radius ceil(3σ+.5) with per-pixel
Gaussian-integrated weights, plus a separate thread-safe "light image" for
forward-transport direct splats normalized by total sample count.

Here the film is a functional pytree updated with batched scatter-adds
(`.at[].add`) — XLA lowers these to efficient TPU scatters; per-chip partial
films are merged with a `psum` in the distributed renderer.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Film:
    value: jnp.ndarray      # (H, W, C) filtered accumulation
    weight: jnp.ndarray     # (H, W) filter weight sum
    direct: jnp.ndarray     # (H, W, C) light image (direct splats)
    rfilter_sigma: float = struct.field(pytree_node=False, default=0.25)
    radius: int = struct.field(pytree_node=False, default=1)

    @property
    def shape(self):
        return self.value.shape


def make_film(width: int, height: int, channels: int = 3,
              rfilter_sigma: float = 0.25) -> Film:
    radius = int(math.ceil(3.0 * rfilter_sigma + 0.5))
    return Film(
        value=jnp.zeros((height, width, channels), jnp.float32),
        weight=jnp.zeros((height, width), jnp.float32),
        direct=jnp.zeros((height, width, channels), jnp.float32),
        rfilter_sigma=rfilter_sigma, radius=radius)


def _gauss_cdf(x, sigma):
    return 0.5 * (1.0 + jax_erf(x / (sigma * math.sqrt(2.0))))


def jax_erf(x):
    import jax
    return jax.scipy.special.erf(x)


def splat(film: Film, pos: jnp.ndarray, values: jnp.ndarray,
          mask: jnp.ndarray) -> Film:
    """Splat N samples at continuous pixel positions pos (N, 2) [x, y]
    with channel values (N, C); mask (N,) selects live lanes.

    Each sample contributes to a (2r+1)² window; per-pixel weights are the
    Gaussian integrated over the pixel footprint (film.hpp:303-342),
    separable in x and y.
    """
    r = film.radius
    sigma = film.rfilter_sigma
    H, W, C = film.value.shape
    px = pos[..., 0] - 0.5   # sample position in pixel-center coordinates
    py = pos[..., 1] - 0.5
    ix = jnp.floor(px).astype(jnp.int32)
    iy = jnp.floor(py).astype(jnp.int32)

    value = film.value
    weight = film.weight
    vmask = mask & jnp.all(jnp.isfinite(values), axis=-1)
    vals = jnp.where(vmask[..., None], values, 0.0)

    for dy in range(-r, r + 1):
        yy = iy + dy
        # ∫ gauss over pixel footprint, centred on sample
        wy = _gauss_cdf(yy.astype(jnp.float32) + 0.5 - py, sigma) \
            - _gauss_cdf(yy.astype(jnp.float32) - 0.5 - py, sigma)
        for dx in range(-r, r + 1):
            xx = ix + dx
            wx = _gauss_cdf(xx.astype(jnp.float32) + 0.5 - px, sigma) \
                - _gauss_cdf(xx.astype(jnp.float32) - 0.5 - px, sigma)
            w = wx * wy
            inside = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H) & vmask
            w = jnp.where(inside, w, 0.0)
            xc = jnp.clip(xx, 0, W - 1)
            yc = jnp.clip(yy, 0, H - 1)
            value = value.at[yc, xc].add(w[..., None] * vals)
            weight = weight.at[yc, xc].add(w)
    return film.replace(value=value, weight=weight)


def splat_direct(film: Film, pos: jnp.ndarray, values: jnp.ndarray,
                 mask: jnp.ndarray) -> Film:
    """Nearest-texel splat into the light image (forward transport;
    reference film.hpp:214-245 splat_direct)."""
    H, W, C = film.direct.shape
    ix = jnp.clip(pos[..., 0].astype(jnp.int32), 0, W - 1)
    iy = jnp.clip(pos[..., 1].astype(jnp.int32), 0, H - 1)
    vmask = mask & jnp.all(jnp.isfinite(values), axis=-1)
    inside = (pos[..., 0] >= 0) & (pos[..., 0] < W) \
        & (pos[..., 1] >= 0) & (pos[..., 1] < H) & vmask
    vals = jnp.where(inside[..., None], values, 0.0)
    return film.replace(direct=film.direct.at[iy, ix].add(vals))


def splat_direct_gaussian(film: Film, pos: jnp.ndarray,
                          sigma_px: jnp.ndarray, values: jnp.ndarray,
                          mask: jnp.ndarray, radius: int = 2) -> Film:
    """Gaussian-weighted direct splat: the beam's wavefront integrated over
    the elements it covers (reference virtual_plane `Si`,
    virtual_plane_sensor.cpp; gaussian_wavefront integrate). σ is
    per-sample in element units; weights renormalize over the window so
    total deposited power is conserved."""
    H, W, C = film.direct.shape
    px = pos[..., 0] - 0.5
    py = pos[..., 1] - 0.5
    ix = jnp.floor(px).astype(jnp.int32)
    iy = jnp.floor(py).astype(jnp.int32)
    sig = jnp.clip(sigma_px, 0.05, float(radius))
    vmask = mask & jnp.all(jnp.isfinite(values), axis=-1)
    vals = jnp.where(vmask[..., None], values, 0.0)

    # accumulate window weights, then renormalize
    ws = []
    coords = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            xx = ix + dx
            yy = iy + dy
            d2 = (xx.astype(jnp.float32) - px) ** 2 \
                + (yy.astype(jnp.float32) - py) ** 2
            w = jnp.exp(-0.5 * d2 / (sig * sig))
            inside = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)
            ws.append(jnp.where(inside, w, 0.0))
            coords.append((jnp.clip(xx, 0, W - 1), jnp.clip(yy, 0, H - 1)))
    wsum = sum(ws)
    wsum = jnp.maximum(wsum, 1e-12)
    direct = film.direct
    for w, (xx, yy) in zip(ws, coords):
        direct = direct.at[yy, xx].add(
            (w / wsum)[..., None] * vals)
    return film.replace(direct=direct)


def develop(film: Film, total_samples_per_element: float = 0.0):
    """Final image: filtered value / filter weight, plus the light image
    normalized by samples-per-element (film_storage.hpp develop_d2)."""
    img = film.value / jnp.maximum(film.weight, 1e-12)[..., None]
    if total_samples_per_element > 0:
        img = img + film.direct / total_samples_per_element
    return img
