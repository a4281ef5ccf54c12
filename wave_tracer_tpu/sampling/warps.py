"""Sampling warps: unit square -> hemisphere/sphere/disk/cone/triangle.

Batched jnp versions of reference include/wt/sampler/sampler.hpp:123-310.
All take u of shape (..., 2) and return directions of shape (..., 3) in the
local frame (z = normal). PDFs are solid-angle densities unless noted.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

INV_PI = 1.0 / math.pi
INV_2PI = 1.0 / (2.0 * math.pi)
INV_4PI = 1.0 / (4.0 * math.pi)


def uniform_hemisphere(u):
    z = u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * math.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_hemisphere_pdf():
    return INV_2PI


def uniform_sphere(u):
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * math.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_sphere_pdf():
    return INV_4PI


def concentric_disk(u):
    """Concentric (Shirley) square->disk map, uniform area density."""
    ox = 2.0 * u[..., 0] - 1.0
    oy = 2.0 * u[..., 1] - 1.0
    zero = (ox == 0.0) & (oy == 0.0)
    cond = jnp.abs(ox) > jnp.abs(oy)
    safe_ox = jnp.where(ox == 0, 1.0, ox)
    safe_oy = jnp.where(oy == 0, 1.0, oy)
    r = jnp.where(cond, ox, oy)
    theta = jnp.where(cond,
                      (math.pi / 4.0) * (oy / safe_ox),
                      (math.pi / 2.0) - (math.pi / 4.0) * (ox / safe_oy))
    d = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
    return jnp.where(zero[..., None], jnp.zeros_like(d), d)


def cosine_hemisphere(u):
    d = concentric_disk(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    return jnp.concatenate([d, z[..., None]], axis=-1)


def cosine_hemisphere_pdf(cos_theta):
    return jnp.maximum(cos_theta, 0.0) * INV_PI


def uniform_cone(solid_angle, u):
    """Uniform direction in a cone of given solid angle around +z
    (sampler.hpp:232-247): cos_theta in [1 - sa/2pi, 1]."""
    cos_theta = 1.0 - u[..., 0] * solid_angle * INV_2PI
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * math.pi * u[..., 1]
    return jnp.stack([sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi),
                      cos_theta], axis=-1)


def uniform_cone_pdf(solid_angle):
    return 1.0 / solid_angle


def uniform_triangle(u):
    """Barycentric coordinates with uniform area density (low-distortion
    sqrt parameterization)."""
    su0 = jnp.sqrt(u[..., 0])
    b0 = 1.0 - su0
    b1 = u[..., 1] * su0
    return jnp.stack([b0, b1], axis=-1)


def gaussian2d(n01, sigma):
    """Map standard-normal draws n01 (..., 2) to an isotropic 2D gaussian."""
    return n01 * sigma[..., None]


def solid_angle_of_cone(cos_cutoff):
    return 2.0 * math.pi * (1.0 - cos_cutoff)
