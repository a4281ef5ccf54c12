"""Exact elliptic-cone intersection kernels (batched, branch-free).

The reference's cone-mode ADS queries bottom out in exact cone-primitive
tests (reference include/wt/math/intersect/cone.hpp:39-128 cone-edge
quadratic, :171 cone-plane, :479 test_cone_tri, :550-627
intersect_cone_tri returning the minimal-distance entry point). This
module is the TPU re-design: every test is a closed-form masked
computation evaluated for a (lanes, tile) block of candidates at once —
no stacks, no branches, no early-outs.

Convention: all inputs are in the cone's LOCAL SCALED frame — origin at
the cone origin, z along the propagation axis, x along the major axis,
and the y coordinate PRE-MULTIPLIED by the eccentricity e, so the cone is
circular with radius r(z) = x0 + tan_alpha * z. Callers build the frame
once per lane and scale y when transforming candidates in.
"""

from __future__ import annotations

import jax.numpy as jnp

BIG = 1e30
_EPS = 1e-12


def _safe_div(a, b, eps=_EPS):
    return a / jnp.where(jnp.abs(b) < eps, jnp.where(b < 0, -eps, eps), b)


def cone_contains(x0, ta, p, zmin, zmax):
    """Point-in-cone (local scaled coords). p (..., 3)."""
    z = p[..., 2]
    r = x0 + ta * z
    apex = -_safe_div(x0, jnp.maximum(ta, _EPS))
    ok = (z >= zmin) & (z <= zmax) & (z >= jnp.where(ta > 0, apex, -BIG))
    return ok & (p[..., 0] ** 2 + p[..., 1] ** 2 <= r * r)


def cone_edge_entry(x0, ta, A, B, zmin, zmax):
    """Minimal-z point of segment AB inside the cone.

    A, B (..., 3) local scaled. Returns (z, s, valid): the smallest
    z with A + s*(B-A) inside the cone and z in [zmin, zmax]
    (reference intersect_cone_edge, cone.hpp:39-128). Branch-free: the
    candidate set {quadratic roots, s=0, s=1, z-window crossings} is
    evaluated and masked.
    """
    E = B - A
    r0 = x0 + ta * A[..., 2]
    # q(s) = |P_xy|^2 - r(z)^2 = a s^2 + b s + c <= 0 inside
    a = E[..., 0] ** 2 + E[..., 1] ** 2 - (ta * E[..., 2]) ** 2
    b = 2.0 * (A[..., 0] * E[..., 0] + A[..., 1] * E[..., 1]
               - ta * E[..., 2] * r0)
    c = A[..., 0] ** 2 + A[..., 1] ** 2 - r0 * r0

    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    # robust roots (avoid catastrophic cancellation)
    qq = -0.5 * (b + jnp.sign(b) * sq)
    s_r1 = _safe_div(qq, a)
    s_r2 = _safe_div(c, qq)
    lin = jnp.abs(a) < _EPS
    s_lin = _safe_div(-c, b)
    s_r1 = jnp.where(lin, s_lin, s_r1)
    s_r2 = jnp.where(lin, s_lin, s_r2)
    roots_ok = jnp.where(lin, jnp.abs(b) >= _EPS, disc >= 0.0)

    Ez = E[..., 2]
    s_zlo = _safe_div(zmin - A[..., 2], Ez)
    s_zhi = _safe_div(zmax - A[..., 2], Ez)

    apex = -_safe_div(x0, jnp.maximum(ta, _EPS))
    zlo_eff = jnp.maximum(zmin, jnp.where(ta > 0, apex, -BIG))

    def feasible(s):
        s = jnp.clip(s, 0.0, 1.0)
        q = (a * s + b) * s + c
        z = A[..., 2] + s * Ez
        ok = (q <= 1e-6 * jnp.maximum(r0 * r0, 1.0)) \
            & (z >= zlo_eff) & (z <= zmax)
        return s, z, ok

    best_z = jnp.full(A.shape[:-1], BIG)
    best_s = jnp.zeros(A.shape[:-1])
    for s_c, extra in ((s_r1, roots_ok), (s_r2, roots_ok),
                       (jnp.zeros_like(s_r1), None),
                       (jnp.ones_like(s_r1), None),
                       (s_zlo, None), (s_zhi, None)):
        s, z, ok = feasible(s_c)
        if extra is not None:
            ok = ok & extra
        better = ok & (z < best_z)
        best_z = jnp.where(better, z, best_z)
        best_s = jnp.where(better, s, best_s)
    valid = best_z < BIG
    return jnp.where(valid, best_z, BIG), best_s, valid


def cone_plane_entry(x0, ta, n, dist, zmin, zmax):
    """Nearest-z point of the cone-surface ∩ plane conic.

    Plane: n·p = dist in local scaled coords (n need not be unit).
    Returns (z, pxy (..., 2), valid) — the reference's
    intersect_cone_plane near point (cone.hpp:171) used to catch
    triangles entered through their interior.
    """
    rho = jnp.sqrt(n[..., 0] ** 2 + n[..., 1] ** 2)
    nz = n[..., 2]
    # feasible z: |dist - nz*z| <= rho * (x0 + ta z), two linear bounds
    #   c1: (rho*ta + nz) z >= dist - rho*x0
    #   c2: (rho*ta - nz) z >= -dist - rho*x0
    a1 = rho * ta + nz
    b1 = dist - rho * x0
    a2 = rho * ta - nz
    b2 = -dist - rho * x0

    def bound(a, b):
        """Constraint a*z >= b → (lo, hi) interval contribution."""
        lo = jnp.where(a > _EPS, b / jnp.maximum(a, _EPS), -BIG)
        hi = jnp.where(a < -_EPS, b / jnp.minimum(a, -_EPS), BIG)
        infeasible = (jnp.abs(a) <= _EPS) & (b > 0)
        return jnp.where(infeasible, BIG, lo), \
            jnp.where(infeasible, -BIG, hi)

    lo1, hi1 = bound(a1, b1)
    lo2, hi2 = bound(a2, b2)
    apex = -_safe_div(x0, jnp.maximum(ta, _EPS))
    z_lo = jnp.maximum(jnp.maximum(lo1, lo2),
                       jnp.maximum(zmin, jnp.where(ta > 0, apex, -BIG)))
    z_hi = jnp.minimum(jnp.minimum(hi1, hi2), zmax)
    valid = z_lo <= z_hi
    z = z_lo
    r = x0 + ta * z
    # boundary point: cos(theta-phi) = ±1 → xy = sign * r * n_xy / rho
    s = jnp.sign(dist - nz * z)
    s = jnp.where(s == 0, 1.0, s)
    safe_rho = jnp.maximum(rho, _EPS)
    pxy = (s * r / safe_rho)[..., None] * n[..., 0:2]
    # rho ~ 0: plane ⊥ axis, conic is the full disk r(z) at z = dist/nz;
    # entry point choice is arbitrary on the disk — take (0, 0) (the axis
    # point), which is always inside the disk
    perp = rho <= _EPS
    z_perp = _safe_div(dist, nz)
    z = jnp.where(perp, z_perp, z)
    pxy = jnp.where(perp[..., None], 0.0, pxy)
    valid = jnp.where(perp,
                      (z_perp >= zmin) & (z_perp <= zmax), valid)
    return z, pxy, valid


def _point_in_tri_2d(p, a, b, c):
    """2D point-in-triangle via signed edge functions."""
    def edge(u, v):
        return (v[..., 0] - u[..., 0]) * (p[..., 1] - u[..., 1]) \
            - (v[..., 1] - u[..., 1]) * (p[..., 0] - u[..., 0])
    e0 = edge(a, b)
    e1 = edge(b, c)
    e2 = edge(c, a)
    pos = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
    neg = (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
    return pos | neg


def _axis_tri(A, B, C):
    """z-axis ray vs triangle in local coords. Returns (z, hit)."""
    e1 = B - A
    e2 = C - A
    n = jnp.cross(e1, e2)
    denom = n[..., 2]
    d = jnp.sum(n * A, axis=-1)
    z = _safe_div(d, denom)
    # barycentric of (0, 0) in the xy-projection
    inside = _point_in_tri_2d(jnp.zeros_like(A[..., 0:2]),
                              A[..., 0:2], B[..., 0:2], C[..., 0:2])
    return z, inside & (jnp.abs(denom) > _EPS)


def intersect_cone_tri(x0, ta, A, B, C, zmin, zmax):
    """Exact cone-triangle intersection: minimal-distance entry point.

    A, B, C (..., 3) in local scaled coords. Returns (z, p (..., 3),
    valid) — reference intersect_cone_tri (cone.hpp:550-627): candidates
    are vertices inside the cone, cone-edge entries, the central-axis
    hit, and the cone∩plane conic near point when it falls inside the
    triangle; minimum z wins.
    """
    sh = A.shape[:-1]
    best_z = jnp.full(sh, BIG)
    best_p = jnp.zeros(sh + (3,))

    def consider(z, p, ok):
        nonlocal best_z, best_p
        better = ok & (z < best_z)
        best_z = jnp.where(better, z, best_z)
        best_p = jnp.where(better[..., None], p, best_p)

    # 1. vertices inside the cone
    for V in (A, B, C):
        consider(V[..., 2], V, cone_contains(x0, ta, V, zmin, zmax))

    # 2. edge entries
    for (U, V) in ((A, B), (A, C), (B, C)):
        z, s, ok = cone_edge_entry(x0, ta, U, V, zmin, zmax)
        p = U + s[..., None] * (V - U)
        consider(z, p, ok)

    # 3. central-axis hit
    z_ax, hit_ax = _axis_tri(A, B, C)
    p_ax = jnp.stack([jnp.zeros(sh), jnp.zeros(sh), z_ax], axis=-1)
    consider(z_ax, p_ax, hit_ax & (z_ax >= zmin) & (z_ax <= zmax))

    # 4. conic near point inside the triangle
    n = jnp.cross(B - A, C - A)
    dist = jnp.sum(n * A, axis=-1)
    z_c, pxy, ok_c = cone_plane_entry(x0, ta, n, dist, zmin, zmax)
    # in-triangle test in a projection plane robust to the tri orientation:
    # drop the axis of largest |n| component
    p_c = jnp.concatenate([pxy, z_c[..., None]], axis=-1)
    an = jnp.abs(n)
    drop = jnp.argmax(an, axis=-1)

    def proj2(v):
        keep0 = jnp.where(drop == 0, v[..., 1], v[..., 0])
        keep1 = jnp.where(drop == 2, v[..., 1], v[..., 2])
        return jnp.stack([keep0, keep1], axis=-1)

    in_tri = _point_in_tri_2d(proj2(p_c), proj2(A), proj2(B), proj2(C))
    consider(z_c, p_c, ok_c & in_tri)

    valid = best_z < BIG
    return jnp.where(valid, best_z, BIG), best_p, valid


def to_local_scaled(ro, xh, yh, zh, e, p):
    """World point(s) → cone local scaled coords.

    ro/xh/yh/zh (..., 3) per-lane frame, e (...,) eccentricity,
    p (..., 3) points (broadcastable)."""
    u = p - ro
    return jnp.stack([
        jnp.sum(u * xh, axis=-1),
        e * jnp.sum(u * yh, axis=-1),
        jnp.sum(u * zh, axis=-1)], axis=-1)
