"""Primitive intersection kernels (batched jnp; used by both the brute-force
wavefront intersector and the BVH traversal).

TPU-native counterparts of reference include/wt/math/intersect/ray.hpp
(Moller-Trumbore, two-sided) and intersect/cone.hpp. The reference's 8-wide
AVX clusters become whole-array batches here.
"""

from __future__ import annotations

import jax.numpy as jnp

BIG = jnp.float32(3.4e38)


def ray_tri(ro, rd, p0, e1, e2, tmin, tmax, inset: float = 0.0):
    """Two-sided Moller-Trumbore.

    ro, rd: (..., 3) ray origin/direction
    p0, e1, e2: (..., 3) triangle vertex 0 and edges (p1-p0, p2-p0)
    Broadcasts; returns (t, u, v, hit) with t=BIG where missed.

    inset: optional barycentric shrink of the triangle (u, v, 1−u−v ≥
    inset). A shadow-test inset was tried against the cross-lowering
    flip problem (round-5) and REMOVED: it did not move the measured
    flip rate (the flips live in the coherent-sum side/visibility
    classifications, not the any-hit boundary) and it leaks through
    mesh vertices where many triangles meet (rays aimed at a pole
    vertex miss every adjacent triangle's shrunken interior).
    """
    pvec = jnp.cross(rd, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    # two-sided: reject only near-degenerate dets
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tvec = ro - p0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(rd * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = ((jnp.abs(det) > 1e-12) & (u >= inset) & (v >= inset)
           & (u + v <= 1.0 - inset) & (t > tmin) & (t <= tmax))
    return jnp.where(hit, t, BIG), u, v, hit


def ray_aabb(ro, inv_rd, bmin, bmax, tmin, tmax):
    """Slab test; returns (t_enter, hit). Handles inf*0 via maximum/minimum
    NaN-filtering (reference intersect_ray_aabb_fast, ray.hpp)."""
    t0 = (bmin - ro) * inv_rd
    t1 = (bmax - ro) * inv_rd
    tsm = jnp.minimum(t0, t1)
    tbg = jnp.maximum(t0, t1)
    t_enter = jnp.maximum(jnp.max(tsm, axis=-1), tmin)
    t_exit = jnp.minimum(jnp.min(tbg, axis=-1), tmax)
    return t_enter, t_enter <= t_exit


def point_segment_dist2(p, a, b):
    """Squared distance from point(s) p to segment(s) [a,b], all (..., 3)."""
    ab = b - a
    tproj = jnp.sum((p - a) * ab, axis=-1) / jnp.maximum(
        jnp.sum(ab * ab, axis=-1), 1e-30)
    tproj = jnp.clip(tproj, 0.0, 1.0)
    closest = a + tproj[..., None] * ab
    d = p - closest
    return jnp.sum(d * d, axis=-1), tproj


def tri_point_closest(p, p0, p1, p2):
    """Closest point on triangle to p (..., 3). Returns (point, dist2)."""
    # project onto plane, then clamp to edges if outside
    e1 = p1 - p0
    e2 = p2 - p0
    n = jnp.cross(e1, e2)
    nn = jnp.maximum(jnp.sum(n * n, axis=-1, keepdims=True), 1e-30)
    dist_pl = jnp.sum((p - p0) * n, axis=-1, keepdims=True) / nn
    proj = p - dist_pl * n
    # barycentric of projection
    d00 = jnp.sum(e1 * e1, axis=-1)
    d01 = jnp.sum(e1 * e2, axis=-1)
    d11 = jnp.sum(e2 * e2, axis=-1)
    d20 = jnp.sum((proj - p0) * e1, axis=-1)
    d21 = jnp.sum((proj - p0) * e2, axis=-1)
    denom = jnp.maximum(d00 * d11 - d01 * d01, 1e-30)
    v = (d11 * d20 - d01 * d21) / denom
    w = (d00 * d21 - d01 * d20) / denom
    inside = (v >= 0) & (w >= 0) & (v + w <= 1)

    d2e0, _ = point_segment_dist2(p, p0, p1)
    d2e1, _ = point_segment_dist2(p, p1, p2)
    d2e2, _ = point_segment_dist2(p, p2, p0)
    d2_edge = jnp.minimum(jnp.minimum(d2e0, d2e1), d2e2)

    d2_in = jnp.sum((p - proj) * (p - proj), axis=-1)
    return jnp.where(inside, d2_in, d2_edge)
