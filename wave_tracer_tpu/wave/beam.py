"""Beam phase-space geometry: SBP, minimum-uncertainty beams, wavefronts.

Reference include/wt/beam/beam_geometry.hpp:32-180 (phase-space extents and
the SBP ≥ ¼ uncertainty bound with a 3σ cross-section envelope) and
include/wt/beam/gaussian_wavefront.hpp (Gaussian cross-section intensity).
All functions are elementwise jnp over lane batches; wavenumbers in rad/m.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# beam cross-section envelope = 3σ (reference gaussian_wavefront.hpp:25)
ENVELOPE = 3.0
MUB_SBP = 0.25


def sbp(spatial_extent, tan_alpha, k):
    """Space-bandwidth product: (σ_area)·(k·tanα/3)²
    (beam_geometry.hpp sbp())."""
    area_std = spatial_extent / (ENVELOPE ** 2)
    wv_std = (k * tan_alpha / ENVELOPE) ** 2
    return area_std * wv_std


def is_mub(spatial_extent, tan_alpha, k, tol=3e-7):
    return sbp(spatial_extent, tan_alpha, k) >= MUB_SBP - tol


def minimum_uncertainty_tan_alpha(spatial_extent, k):
    """tanα of a MUB with the given spatial extent (area)."""
    ta = jnp.sqrt(MUB_SBP / jnp.maximum(spatial_extent, 1e-30)) \
        * ENVELOPE ** 2 / jnp.maximum(k, 1e-30)
    return jnp.where(spatial_extent > 0, ta, 0.0)


def minimum_uncertainty_spatial_extent(tan_alpha, k):
    """Spatial extent (area) of a MUB with the given tanα."""
    ln = math.sqrt(MUB_SBP) * ENVELOPE ** 2 \
        / jnp.maximum(k * tan_alpha, 1e-30)
    return jnp.where(tan_alpha > 0, ln * ln, 0.0)


def make_mub(spatial_extent, tan_alpha, k):
    """Enlarge a phase-space extent to satisfy SBP ≥ ¼
    (beam_geometry.hpp make_mub). Returns (spatial_extent, tan_alpha)."""
    s = sbp(spatial_extent, tan_alpha, k)
    zero_sbp = s <= 0.0
    # zero-sbp: fill in the missing dimension
    se_fill = jnp.where(tan_alpha > 0,
                        minimum_uncertainty_spatial_extent(tan_alpha, k),
                        spatial_extent)
    ta_fill = jnp.where(tan_alpha > 0, tan_alpha,
                        minimum_uncertainty_tan_alpha(spatial_extent, k))
    # non-zero: enlarge per phase-space dimension
    scale = jnp.sqrt(jnp.sqrt(MUB_SBP / jnp.maximum(s, 1e-30)))
    scale = jnp.maximum(scale, 1.0)
    se_en = spatial_extent * scale ** 2
    ta_en = tan_alpha * scale
    se = jnp.where(zero_sbp, se_fill, se_en)
    ta = jnp.where(zero_sbp, ta_fill, ta_en)
    return se, ta


# ---------------------------------------------------------------------------
# gaussian wavefront (cross-section intensity distribution)
# ---------------------------------------------------------------------------

def wavefront_sigma(major, minor):
    """σ of the Gaussian cross-section given envelope (3σ) axes."""
    return major / ENVELOPE, minor / ENVELOPE


def wavefront_amplitude(sx, sy):
    """Normalization 1/(2π σx σy) of the 2D Gaussian."""
    return 1.0 / jnp.maximum(2.0 * math.pi * sx * sy, 1e-30)


def wavefront_density(p2, sx, sy):
    """2D Gaussian density at cross-section point p2 (..., 2)."""
    q = (p2[..., 0] / jnp.maximum(sx, 1e-30)) ** 2 \
        + (p2[..., 1] / jnp.maximum(sy, 1e-30)) ** 2
    return wavefront_amplitude(sx, sy) * jnp.exp(-0.5 * q)


def wavefront_mass_in_radius(r, sx, sy):
    """Mass of the isotropized Gaussian within radius r (σ = √(σxσy));
    used for footprint-coverage estimates."""
    s2 = jnp.maximum(sx * sy, 1e-30)
    return 1.0 - jnp.exp(-0.5 * r * r / s2)


def beam_footprint_axes(cone, z):
    """Envelope ellipse axes at distance z along the beam."""
    return cone.axes(z)


def surface_footprint_ellipse(cone, z, d, n, t_dir=None):
    """Beam cross-section at distance z stretched onto a surface with
    normal n hit by direction d: the cross-section ellipse is projected
    along d onto the tangent plane (reference beam_generic.hpp
    surface_footprint_static behaviour, first-order).

    Returns (a_world (..., 3), b_world (..., 3)) footprint axes on the
    surface (not necessarily orthogonal after projection).
    """
    from wave_tracer_tpu.math import vec
    major, minor = cone.axes(z)
    ax_w = cone.x * major[..., None]
    by_w = cone.y * minor[..., None]
    # project along d onto plane ⊥ n: v ↦ v − d·(n·v)/(n·d)
    nd = vec.vdot(n, d)
    nd = jnp.where(jnp.abs(nd) < 1e-6, jnp.sign(nd) * 1e-6 + 1e-12, nd)

    def proj(v):
        return v - d * (vec.vdot(n, v) / nd)
    return proj(ax_w), proj(by_w)
