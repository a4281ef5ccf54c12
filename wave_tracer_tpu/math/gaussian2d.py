"""2D Gaussian mass over triangles — wavefront-over-triangle power.

TPU re-design of the reference's `gaussian2d_t::integrate_triangle`
(reference include/wt/math/distribution/gaussian2d.hpp:170-177,
src/math/gaussian2d.cpp:96 — erf-LUT quadrature, self-described as "slow
and not very accurate, 1-3% rel err"). Here the integral is computed with
Green's theorem in the Gaussian's canonical frame:

    ∬_T φ(x)φ(y) dA = Σ_edges ∫ Φ(x(t)) φ(y(t)) ẏ dt

per edge the parameter range is clipped to the mass band |y| ≤ L and split
at the erf saturation bounds x = ±L: the x > L piece integrates
analytically to Φ(y) differences, the x < −L piece vanishes, and only the
transition window x ∈ [−L, L] needs quadrature (fixed-order
Gauss–Legendre — branch-free, lane-batched). Typical accuracy ≤ 1e-4
rel., far better than the reference, at a handful of fused ops per edge.

Also provides the z-slab triangle clipper used by the BDPT wavefront-power
integral (reference include/wt/math/intersect/clip.hpp:85
`clip_triangle_z`).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

SQRT_HALF = math.sqrt(0.5)
L_BAND = 5.0          # canonical saturation bound (erf(5/√2) ≈ 1 − 6e-13)
_GL_N = 16
CAP = 5               # max polygon vertices after a two-plane slab clip

# Gauss–Legendre nodes/weights on [0, 1]
_gl_x, _gl_w = np.polynomial.legendre.leggauss(_GL_N)
GL_T = jnp.asarray(0.5 * (_gl_x + 1.0), jnp.float32)
GL_W = jnp.asarray(0.5 * _gl_w, jnp.float32)


def _phi(y):
    """Standard normal density."""
    return jnp.exp(-0.5 * y * y) / math.sqrt(2.0 * math.pi)


def _Phi(x):
    """Standard normal CDF."""
    return 0.5 * (1.0 + jax.scipy.special.erf(x * SQRT_HALF))


def _edge_mass(p0, p1):
    """Signed Green's-theorem contribution of one canonical-space edge.

    p0, p1: (..., 2). Returns (...,).
    """
    x0, y0 = p0[..., 0], p0[..., 1]
    x1, y1 = p1[..., 0], p1[..., 1]
    dx = x1 - x0
    dy = y1 - y0

    # clip t to the band |y| ≤ L (y linear in t)
    y_const = jnp.abs(dy) < 1e-12
    safe_dy = jnp.where(y_const, 1e-12, dy)
    ta = (-L_BAND - y0) / safe_dy
    tb = (L_BAND - y0) / safe_dy
    t_lo = jnp.clip(jnp.minimum(ta, tb), 0.0, 1.0)
    t_hi = jnp.clip(jnp.maximum(ta, tb), 0.0, 1.0)
    y_in = jnp.abs(y0) <= L_BAND
    t_lo = jnp.where(y_const, jnp.where(y_in, 0.0, 1.0), t_lo)
    t_hi = jnp.where(y_const, 1.0, t_hi)

    # x saturation split: s_lo/s_hi bound the window x(t) ∈ [−L, L]
    x_const = jnp.abs(dx) < 1e-12
    safe_dx = jnp.where(x_const, 1e-12, dx)
    sa = (-L_BAND - x0) / safe_dx
    sb = (L_BAND - x0) / safe_dx
    s_lo = jnp.minimum(sa, sb)
    s_hi = jnp.maximum(sa, sb)

    # quadrature window [q0, q1] = [t_lo, t_hi] ∩ [s_lo, s_hi]
    q0 = jnp.clip(jnp.maximum(t_lo, s_lo), 0.0, 1.0)
    q1 = jnp.clip(jnp.minimum(t_hi, s_hi), 0.0, 1.0)
    x_in = jnp.abs(x0) <= L_BAND
    q0 = jnp.where(x_const, jnp.where(x_in, t_lo, t_hi), q0)
    q1 = jnp.where(x_const, jnp.where(x_in, t_hi, t_hi), q1)
    q1 = jnp.maximum(q1, q0)

    def Phi_y(t):
        return _Phi(y0 + dy * t)

    # saturated pieces (Φ(x) = 1 where x(t) > L): before the window when
    # x decreases (dx<0), after it when x increases (dx>0); analytic
    # ∫ φ(y) ẏ dt = Φ(y(t1)) − Φ(y(t0)).
    a0 = t_lo
    a1 = jnp.maximum(jnp.minimum(t_hi, jnp.clip(s_lo, 0.0, 1.0)), a0)
    b1 = t_hi
    b0 = jnp.minimum(jnp.maximum(t_lo, jnp.clip(s_hi, 0.0, 1.0)), b1)
    contrib = jnp.where(~x_const & (dx < 0), Phi_y(a1) - Phi_y(a0), 0.0) \
        + jnp.where(~x_const & (dx > 0), Phi_y(b1) - Phi_y(b0), 0.0) \
        + jnp.where(x_const & (x0 > L_BAND), Phi_y(t_hi) - Phi_y(t_lo),
                    0.0)

    # quadrature over the transition window
    t = q0[..., None] + (q1 - q0)[..., None] * GL_T
    xq = x0[..., None] + dx[..., None] * t
    yq = y0[..., None] + dy[..., None] * t
    integ = jnp.sum(GL_W * _Phi(xq) * _phi(yq), axis=-1)
    contrib = contrib + integ * (q1 - q0) * dy
    return contrib


def integrate_triangle(a, b, c, sx, sy):
    """Mass of the centred axis-aligned Gaussian N(0, diag(sx², sy²))
    over triangle (a, b, c) — points (..., 2) in the Gaussian's frame.

    Returns (...,) in [0, 1]. Winding-independent (absolute value).
    """
    sx = jnp.maximum(sx, 1e-30)
    sy = jnp.maximum(sy, 1e-30)
    s = jnp.stack([jnp.broadcast_to(sx, a.shape[:-1]),
                   jnp.broadcast_to(sy, a.shape[:-1])], axis=-1)
    ac, bc, cc = a / s, b / s, c / s
    m = _edge_mass(ac, bc) + _edge_mass(bc, cc) + _edge_mass(cc, ac)
    return jnp.clip(jnp.abs(m), 0.0, 1.0)


# ---------------------------------------------------------------------------
# z-slab triangle clipping (reference include/wt/math/intersect/clip.hpp:85)
# ---------------------------------------------------------------------------

def clip_triangle_z(pa, pb, pc, z0, z1):
    """Clip triangle (pa, pb, pc) — (..., 3) beam-local points — against
    the slab z ∈ [z0, z1] (z0/z1 (...,)).

    Returns (verts (..., CAP, 3), nverts (...,)): the clipped convex
    polygon as a fixed-capacity vertex list (≤ 5 vertices after clipping a
    triangle against two parallel planes), padded with the last valid
    vertex so fan triangles past nverts are degenerate.
    """
    def clip_half(verts, nv, plane_z, keep_below):
        """Sutherland–Hodgman against z = plane_z."""
        out = jnp.zeros(verts.shape[:-2] + (CAP, 3), verts.dtype)
        cnt = jnp.zeros(nv.shape, jnp.int32)
        for i in range(CAP):
            vi = verts[..., i, :]
            j = jnp.where(i + 1 < nv, i + 1, 0)
            vj = jnp.take_along_axis(
                verts, j[..., None, None].astype(jnp.int32)
                .repeat(3, axis=-1), axis=-2)[..., 0, :]
            if keep_below:
                in_i = vi[..., 2] <= plane_z
                in_j = vj[..., 2] <= plane_z
            else:
                in_i = vi[..., 2] >= plane_z
                in_j = vj[..., 2] >= plane_z
            live = i < nv
            dz = vj[..., 2] - vi[..., 2]
            t = (plane_z - vi[..., 2]) / jnp.where(jnp.abs(dz) < 1e-30,
                                                   1e-30, dz)
            xp = vi + jnp.clip(t, 0.0, 1.0)[..., None] * (vj - vi)

            emit1 = live & in_i
            out = _emit(out, cnt, vi, emit1)
            cnt = cnt + emit1.astype(jnp.int32)
            emit2 = live & (in_i != in_j)
            out = _emit(out, cnt, xp, emit2)
            cnt = cnt + emit2.astype(jnp.int32)
        return out, cnt

    verts0 = jnp.stack([pa, pb, pc] + [pc] * (CAP - 3), axis=-2)
    nv0 = jnp.full(pa.shape[:-1], 3, jnp.int32)
    v1, n1 = clip_half(verts0, nv0, z1, True)    # keep z <= z1
    v2, n2 = clip_half(v1, n1, z0, False)        # keep z >= z0
    # pad with the last valid vertex
    last = jnp.take_along_axis(
        v2, jnp.maximum(n2 - 1, 0)[..., None, None]
        .astype(jnp.int32).repeat(3, axis=-1), axis=-2)
    idx = jnp.arange(CAP).reshape((1,) * (v2.ndim - 2) + (CAP,))
    mask = (idx < n2[..., None])[..., None]
    v2 = jnp.where(mask, v2, last)
    return v2, n2


def _emit(out, cnt, v, do):
    """Scatter v into slot cnt of out where do."""
    idx = jnp.arange(CAP).reshape((1,) * (out.ndim - 2) + (CAP,))
    sel = (idx == cnt[..., None]) & do[..., None]
    return jnp.where(sel[..., None], v[..., None, :], out)


def polygon_gaussian_mass(verts, nverts, sx, sy):
    """Gaussian mass over the convex polygon (verts (..., CAP, ≥2),
    nverts (...,)) via the fan (v0, vi, vi+1). Uses the x/y components."""
    v2 = verts[..., :2]
    total = jnp.zeros(nverts.shape, jnp.float32)
    for i in range(1, CAP - 1):
        tri_mass = integrate_triangle(v2[..., 0, :], v2[..., i, :],
                                      v2[..., i + 1, :], sx, sy)
        total = total + jnp.where(i + 1 < nverts, tri_mass, 0.0)
    return jnp.clip(total, 0.0, 1.0)
