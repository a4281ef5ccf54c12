"""UTD wedge diffraction — batched over (lane, edge) slots.

Reproduces the math of reference include/wt/interaction/fsd/utd.hpp:26-172:
the a± functions, the transition function F (via the Faddeeva primitive in
math/special.py), Keller-cone Fermat diffraction points, and the soft/hard
wedge diffraction coefficients Ds/Dh with their four cotangent terms.

A wedge is described by: centre v, length l, front-face normal nff and
tangent tff (with e = cross(nff, tff) the edge direction), back-face normal
nbf, interior angle α. All arrays broadcast over arbitrary batch shapes —
typically (N, K) for N beam lanes × K aperture edge slots.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from wave_tracer_tpu.math import vec
from wave_tracer_tpu.math.special import utd_transition

UTD_MIN_SIN_BETA = 1e-3
TWO_PI = 2.0 * math.pi


def edge_dir(nff, tff):
    """e = nff × tff (reference wedge_edge_t::e())."""
    return jnp.cross(nff, tff)


def utd_a(sgn, phi, n):
    """The UTD a± function (utd.hpp:26-32)."""
    N = jnp.round((sgn * math.pi + phi) / (TWO_PI * n))
    return 2.0 * jnp.cos(math.pi * n * N - 0.5 * phi) ** 2


def fermat_point_to(v, e, tff, nff, half_l, src, dst):
    """Point on the edge line satisfying Fermat's principle for src→dst
    (utd.hpp diffraction_point(src, dst)). Returns (p, valid)."""
    sv = src - v
    dv = dst - v
    sl = vec.safe_sqrt(vec.dot(sv, tff) ** 2 + vec.dot(sv, nff) ** 2)
    dl = vec.safe_sqrt(vec.dot(dv, tff) ** 2 + vec.dot(dv, nff) ** 2)
    t = vec.dot(e, sv) + vec.dot(dst - src, e) * sl \
        / jnp.maximum(sl + dl, 1e-30)
    valid = jnp.abs(t) <= half_l
    p = v + e * t[..., None]
    valid &= (vec.length2(p - src) > 1e-24) & (vec.length2(p - dst) > 1e-24)
    return p, valid


def fermat_point_dir(v, e, tff, nff, half_l, src, wo):
    """Fermat point for src → direction wo (utd.hpp diffraction_point(src,
    wo)). Returns (p, valid)."""
    cos_beta = vec.dot(wo, e)
    sin_beta = vec.safe_sqrt(1.0 - cos_beta ** 2, 1e-24)
    sv = src - v
    sl = vec.safe_sqrt(vec.dot(sv, tff) ** 2 + vec.dot(sv, nff) ** 2)
    prj = v + vec.dot(sv, e)[..., None] * e
    p = prj + (sl * cos_beta / jnp.maximum(sin_beta, 1e-20))[..., None] * e
    valid = (sin_beta >= UTD_MIN_SIN_BETA) \
        & (vec.length2(p - v) <= half_l ** 2) \
        & (vec.length2(p - src) > 1e-24)
    return p, valid


def utd_coefficients(k, wi, wo, ro, e, tff, nff, alpha):
    """Soft/hard diffraction coefficients Ds, Dh (utd.hpp:112-172).

    wi: unit direction from the diffraction point TOWARD the source;
    wo: unit direction of outgoing propagation; ro: distance to observer.
    Does NOT include the e^{-ikro} phase. Returns (Ds, Dh) complex.
    """
    n = 2.0 - alpha / math.pi

    cos_bi = vec.dot(wi, e)
    sin_beta2 = jnp.maximum(0.0, 1.0 - cos_bi ** 2)
    sin_beta = vec.safe_sqrt(sin_beta2, 1e-24)
    phii = jnp.arctan2(vec.dot(nff, wi), vec.dot(tff, wi))
    phio = jnp.arctan2(vec.dot(nff, wo), vec.dot(tff, wo))

    Li = ro * sin_beta2

    def cot(x):
        return jnp.cos(x) / jnp.where(jnp.abs(jnp.sin(x)) < 1e-9,
                                      1e-9, jnp.sin(x))

    dphi = phii - phio
    sphi = phii + phio
    a1 = utd_a(+1, dphi, n)
    a2 = utd_a(-1, dphi, n)
    a3 = utd_a(+1, sphi, n)
    a4 = utd_a(-1, sphi, n)
    F1 = utd_transition(k * Li * a1)
    F2 = utd_transition(k * Li * a2)
    F3 = utd_transition(k * Li * a3)
    F4 = utd_transition(k * Li * a4)
    inv2n = 1.0 / (2.0 * n)
    D1 = -cot((math.pi + dphi) * inv2n) * F1
    D2 = -cot((math.pi - dphi) * inv2n) * F2
    D3 = -cot((math.pi + sphi) * inv2n) * F3
    D4 = -cot((math.pi - sphi) * inv2n) * F4

    kro = jnp.maximum(k * ro, 1e-20)
    D = (1.0 / (2.0 * n * jnp.sqrt(kro)
                * jnp.maximum(sin_beta, UTD_MIN_SIN_BETA))
         * (1.0 / math.sqrt(TWO_PI))) \
        * jnp.asarray(complex(math.cos(-math.pi / 4),
                              math.sin(-math.pi / 4)), jnp.complex64)

    # degenerate shadow/reflection boundary guard (utd.hpp:157-160)
    t1 = jnp.mod(sphi, math.pi / 2.0)
    t2 = jnp.mod(dphi, math.pi / 2.0)
    degen = (jnp.abs(t1) < 1e-5) | (jnp.abs(t2) < 1e-5)
    Ds = jnp.where(degen, 0.0, D1 + D2 - (D3 + D4))
    Dh = jnp.where(degen, 0.0, D1 + D2 + (D3 + D4))
    return -D * Ds, -D * Dh
