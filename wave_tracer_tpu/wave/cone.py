"""Elliptic cone beams — batched SoA pytree.

The beam envelope of wave_tracer's transport: a cone = central ray +
tangent (major-axis direction) + tan(α) + eccentricity + initial major-axis
length x0 (reference include/wt/math/shapes/elliptic_cone.hpp:30-333,
src/math/elliptic_cone.cpp). Cross-section at distance z is an ellipse with
major axis (tanα·z + x0) along the tangent and minor axis scaled by 1/e.

Everything is a (...,)-batched jnp computation; `cone_through_ellipse`
(built on a closed-form batched 2×2 SVD) runs on every scatter event.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from wave_tracer_tpu.math import frame as frame_mod
from wave_tracer_tpu.math import vec

INF = jnp.inf


@struct.dataclass
class Cone:
    o: jnp.ndarray          # (..., 3) origin
    d: jnp.ndarray          # (..., 3) propagation direction (unit)
    x: jnp.ndarray          # (..., 3) tangent / major-axis direction (⊥ d)
    x0: jnp.ndarray         # (...,) initial major-axis length
    tan_alpha: jnp.ndarray  # (...,) tan of half opening angle
    e: jnp.ndarray          # (...,) major/minor ratio ≥ 1

    @property
    def one_over_e(self):
        return 1.0 / jnp.maximum(self.e, 1.0)

    @property
    def y(self):
        return jnp.cross(self.d, self.x)

    @property
    def z_apex(self):
        """z of apex (≤0); −inf for a degenerate ray."""
        degenerate = (self.x0 == 0) & (self.tan_alpha == 0)
        return jnp.where(degenerate, -INF,
                         -self.x0 / jnp.maximum(self.tan_alpha, 1e-20))

    def is_ray(self):
        return (self.tan_alpha == 0) & (self.x0 == 0)

    def frame(self) -> frame_mod.Frame:
        return frame_mod.Frame(t=self.x, b=self.y, n=self.d)

    def to_local(self, p):
        u = p - self.o
        return jnp.stack([vec.dot(u, self.x), vec.dot(u, self.y),
                          vec.dot(u, self.d)], axis=-1)

    def axes(self, z):
        """(major, minor) axis lengths at distance z (elliptic_cone.hpp
        axes())."""
        r = self.tan_alpha * z + self.x0
        return r, r * self.one_over_e

    def radius(self, z, r2_local):
        """Cross-section radius at z in local 2D direction r2 (unit)."""
        a, b = self.axes(z)
        cos2 = r2_local[..., 0] ** 2
        denom = jnp.sqrt(jnp.maximum(a * a * (1 - cos2) + b * b * cos2,
                                     1e-30))
        return jnp.where((a == 0) | (b == 0), 0.0, a * b / denom)

    def contains_local(self, p, zmin=0.0, zmax=INF):
        z = p[..., 2]
        ok = (z >= zmin) & (z <= zmax) & (self.z_apex <= z)
        lhs = p[..., 0] ** 2 + (self.e * p[..., 1]) ** 2
        rhs = (z * self.tan_alpha + self.x0) ** 2
        return ok & (lhs <= rhs)

    def contains(self, p, zmin=0.0, zmax=INF):
        return self.contains_local(self.to_local(p), zmin, zmax)

    def project_local(self, p, z):
        """Project local point to the cross-section at distance z
        (elliptic_cone.hpp project_local)."""
        xy = p[..., :2]
        z0 = p[..., 2]
        denom = jnp.abs(self.tan_alpha * z0 + self.x0)
        scale = (self.tan_alpha * z + self.x0) / jnp.maximum(denom, 1e-30)
        degenerate = (self.x0 == 0) & (self.tan_alpha == 0)
        return jnp.where(degenerate[..., None], xy, xy * scale[..., None])


def ray_cone(o, d, tan_alpha=None, x0=None):
    """Cone from a central ray with isotropic cross-section."""
    sh = o.shape[:-1]
    z = jnp.zeros(sh, jnp.float32)
    ta = z if tan_alpha is None else jnp.broadcast_to(tan_alpha, sh)
    xx0 = z if x0 is None else jnp.broadcast_to(x0, sh)
    x = frame_mod.build_orthogonal_frame(d).t
    return Cone(o=o, d=d, x=x, x0=xx0, tan_alpha=ta,
                e=jnp.ones(sh, jnp.float32))


def svd2x2(a, b, c, d):
    """Closed-form SVD of [[a, b], [c, d]] (batched).

    Returns (cosU, sinU, s1, s2) with s1 ≥ s2 ≥ 0: left singular vectors
    U = [[cosU, -sinU], [sinU, cosU]], singular values s1, s2.
    """
    E = 0.5 * (a + d)
    F = 0.5 * (a - d)
    G = 0.5 * (c + b)
    H = 0.5 * (c - b)
    Q = jnp.sqrt(E * E + H * H)
    R = jnp.sqrt(F * F + G * G)
    s1 = Q + R
    s2 = jnp.abs(Q - R)
    a1 = jnp.arctan2(G, F)
    a2 = jnp.arctan2(H, E)
    theta = 0.5 * (a2 - a1)    # V angle
    phi = 0.5 * (a2 + a1)      # U angle
    return jnp.cos(phi), jnp.sin(phi), s1, s2, theta


def cone_through_ellipse(ex, ey, n, ro, rd, tan_alpha):
    """Cone with direction rd through the ellipse (axes ex, ey ⊥ n) at ro.

    Mirrors reference src/math/elliptic_cone.cpp cone_through_ellipse: the
    ellipse is orthographically projected onto the plane ⊥ rd; the
    projected ellipse's principal axes (via 2×2 SVD) give the cone tangent,
    x0 and eccentricity (using the reference's e = sqrt(major/minor)
    convention). Returns (cone, self_intersection_distance).
    """
    of = frame_mod.build_orthogonal_frame(rd)
    xh = jnp.stack([vec.dot(ex, of.t), vec.dot(ex, of.b)], axis=-1)
    yh = jnp.stack([vec.dot(ey, of.t), vec.dot(ey, of.b)], axis=-1)
    cU, sU, lX, lY, _ = svd2x2(xh[..., 0], yh[..., 0],
                               xh[..., 1], yh[..., 1])
    X2 = jnp.stack([cU, sU], axis=-1)
    e = jnp.where(lY > 1e-20, jnp.sqrt(lX / jnp.maximum(lY, 1e-20)), 1.0)
    e = jnp.maximum(e, 1.0)
    wx = X2[..., 0:1] * of.t + X2[..., 1:2] * of.b
    wxn = vec.normalize(wx, eps=1e-24)

    degenerate = (vec.length2(ex) + vec.length2(ey)) < 1e-30
    fallback_x = of.t
    x_dir = jnp.where(degenerate[..., None], fallback_x, wxn)
    x0 = jnp.where(degenerate, 0.0, lX)
    ecc = jnp.where(degenerate, 1.0, e)
    cone = Cone(o=ro, d=rd, x=x_dir, x0=x0,
                tan_alpha=jnp.broadcast_to(tan_alpha, x0.shape),
                e=ecc)

    # self-intersection distance: cone ∩ ellipse plane extent past origin
    sid = _cone_plane_exit(cone, n)
    return cone, jnp.where(degenerate, 0.0, sid)


def _cone_plane_exit(cone: Cone, n):
    """Distance along the cone past the origin where it still intersects
    the plane through the origin with normal n (used as the
    self-intersection distance; reference intersect/cone.hpp
    intersect_cone_plane behaviour, conservative closed form)."""
    # half-angle spread of the cone boundary against the plane:
    # boundary rays r(t) = d + tanα(cosφ x + sinφ/e y). The intersection
    # extent is bounded by |t| ≤ x0·|n·m| / max(|n·d| − tanα·s, eps) where
    # m spans the cross-section; use conservative isotropic bound.
    nd = jnp.abs(vec.dot(n, cone.d))
    s = jnp.sqrt(jnp.maximum(1.0 - nd * nd, 0.0))
    denom = nd - cone.tan_alpha * s
    grazing = denom <= 1e-6
    sid = cone.x0 * s / jnp.maximum(denom, 1e-6)
    # grazing cones keep intersecting "forever"; clamp to a large multiple
    return jnp.where(grazing, 1e6 * jnp.maximum(cone.x0, 1e-12), sid)


def cone_through_ellipsoid(axes, fr: frame_mod.Frame, ro, rd, tan_alpha):
    """Cone through an ellipsoid (axes lengths in frame fr) centred at ro
    (reference elliptic_cone.cpp cone_through_ellipsoid)."""
    wo_local = fr.to_local(rd)
    pf = frame_mod.build_orthogonal_frame(wo_local)
    nn = vec.normalize(axes * wo_local, eps=1e-24)
    fc = frame_mod.build_orthogonal_frame(nn)
    t1 = axes * fc.t
    t2 = axes * fc.b
    a = vec.dot(t1, pf.t)
    c = vec.dot(t1, pf.b)
    b = vec.dot(t2, pf.t)
    d = vec.dot(t2, pf.b)
    cU, sU, lX, lY, _ = svd2x2(a, b, c, d)
    e = jnp.where(lY > 1e-20, jnp.sqrt(lX / jnp.maximum(lY, 1e-20)), 1.0)
    X2 = jnp.stack([cU, sU], axis=-1)
    X3 = X2[..., 0:1] * pf.t + X2[..., 1:2] * pf.b
    x_world = vec.normalize(fr.to_world(X3), eps=1e-24)
    degenerate = jnp.abs(a * d - b * c) < 1e-24
    fallback = frame_mod.build_orthogonal_frame(rd).t
    return Cone(o=ro, d=rd,
                x=jnp.where(degenerate[..., None], fallback, x_world),
                x0=jnp.where(degenerate, 0.0, lX),
                tan_alpha=jnp.broadcast_to(tan_alpha, lX.shape),
                e=jnp.where(degenerate, 1.0, jnp.maximum(e, 1.0)))
