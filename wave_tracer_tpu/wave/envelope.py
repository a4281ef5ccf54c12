"""Elliptic beam-envelope transport state + scatter updates.

The reference's beams carry a full elliptic cone envelope that is rebuilt
on every surface scatter by projecting the interaction footprint ellipse
and constructing the new cone through it (reference
include/wt/beam/beam.hpp:379-397 transform_surface_interaction,
include/wt/math/shapes/elliptic_cone.hpp:30-333 and
src/math/elliptic_cone.cpp cone_through_ellipse). This module is that
update as a pure SoA computation: integrators carry an `EnvState` per
lane and call `surface_scatter` at every surface vertex — grazing
incidence correctly stretches the footprint (and hence the next envelope)
anisotropically, which drives FSD aperture sizes and wavefront integrals.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from wave_tracer_tpu.math import frame as frame_mod
from wave_tracer_tpu.math import vec
from wave_tracer_tpu.wave import beam as beam_geo
from wave_tracer_tpu.wave import cone as cone_mod


@struct.dataclass
class EnvState:
    """Per-lane elliptic envelope: cross-section at distance z along the
    central ray has major axis (x0 + ta*z) along x and minor axis /e."""
    x: jnp.ndarray    # (N, 3) major-axis direction (unit, ⊥ ray dir)
    x0: jnp.ndarray   # (N,) major-axis length at the origin
    ta: jnp.ndarray   # (N,) tan half-opening (of the major axis)
    e: jnp.ndarray    # (N,) major/minor eccentricity ≥ 1

    def major(self, z):
        return self.x0 + self.ta * z

    def minor(self, z):
        return self.major(z) / jnp.maximum(self.e, 1.0)

    def area_radius(self, z):
        """sqrt(major*minor): the isotropic-equivalent footprint radius."""
        return jnp.sqrt(jnp.maximum(self.major(z) * self.minor(z), 0.0))


def initial(rd, x0, ta):
    """Isotropic sourcing envelope (sensor/emitter beams)."""
    N = rd.shape[0]
    return EnvState(
        x=frame_mod.build_orthogonal_frame(rd).t,
        x0=jnp.broadcast_to(jnp.asarray(x0, jnp.float32), (N,)),
        ta=jnp.broadcast_to(jnp.asarray(ta, jnp.float32), (N,)),
        e=jnp.ones((N,), jnp.float32))


def footprint_on_surface(env: EnvState, rd, z, n, cos_min: float = 0.05):
    """Interaction-footprint ellipse axes on the surface.

    The beam cross-section ellipse at distance z (axes a*x, b*y ⊥ rd) is
    projected ALONG the propagation direction onto the plane with normal
    n: v -> v - (n.v / n.rd) rd (reference intersection footprint,
    include/wt/interaction/intersection.hpp surface footprint). Grazing
    is clamped at cos_min (reference clamps similarly). Returns (ex, ey)
    world-space (generally non-orthogonal conjugate) axes.
    """
    a = env.major(z)
    b = env.minor(z)
    xh = env.x
    yh = jnp.cross(rd, xh)
    nd = vec.dot(n, rd)
    sgn = jnp.where(nd >= 0, 1.0, -1.0)
    nd = sgn * jnp.maximum(jnp.abs(nd), cos_min)

    def proj(v):
        return v - (vec.dot(n, v) / nd)[..., None] * rd

    return proj(a[..., None] * xh), proj(b[..., None] * yh)


def surface_scatter(env: EnvState, rd, z, n, wo, specular, k,
                    ta_cap: float = 0.3):
    """Envelope after a surface scatter at distance z along rd.

    Builds the new elliptic cone through the surface footprint ellipse in
    the outgoing direction (reference beam.hpp:379-397). Specular lobes
    keep the incident opening angle; scattered lobes restart at the
    minimum-uncertainty opening for the footprint extent (reference
    beam_geometry.hpp make_mub / sourcing from surface ellipse).
    Returns (EnvState, self_intersection_distance).
    """
    ex, ey = footprint_on_surface(env, rd, z, n)
    # MUB opening from the anisotropic footprint (geometric-mean extent)
    ab = jnp.maximum(vec.length(ex) * vec.length(ey), 1e-18)
    ta_mub = beam_geo.minimum_uncertainty_tan_alpha(ab, k)
    ta_next = jnp.where(specular, env.ta, jnp.minimum(ta_mub, ta_cap))
    p = jnp.zeros_like(rd)  # origin irrelevant for the envelope params
    cone, sid = cone_mod.cone_through_ellipse(ex, ey, n, p, wo, ta_next)
    return EnvState(x=cone.x, x0=cone.x0, ta=cone.tan_alpha,
                    e=cone.e), sid


def select(cond, a: EnvState, b: EnvState) -> EnvState:
    c1 = cond[..., None]
    return EnvState(x=jnp.where(c1, a.x, b.x),
                    x0=jnp.where(cond, a.x0, b.x0),
                    ta=jnp.where(cond, a.ta, b.ta),
                    e=jnp.where(cond, a.e, b.e))
