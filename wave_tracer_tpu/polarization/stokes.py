"""Stokes vectors with attached reference frames — batched jnp.

A Stokes 4-vector S = (I, Q, U, V) describes partially-polarized intensity
relative to a reference frame: the propagation direction plus an x-axis in
the transverse plane (Q is the +x/+y linear balance). Frame reorientation
about the propagation axis by angle θ applies the rotation Mueller matrix
R(2θ). Mirrors reference include/wt/interaction/polarimetric/stokes.hpp.

Representation: S as (..., 4) arrays; the frame as the transverse x-axis
vector (..., 3) plus the propagation direction (..., 3). Everything is SoA
and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

from wave_tracer_tpu.math import vec


def unpolarized(I):
    """Stokes vector for unpolarized intensity I (...,) → (..., 4)."""
    z = jnp.zeros_like(I)
    return jnp.stack([I, z, z, z], axis=-1)


def intensity(S):
    return S[..., 0]


def dop(S):
    """Degree of polarization sqrt(Q²+U²+V²)/I."""
    return jnp.sqrt(jnp.sum(S[..., 1:] ** 2, axis=-1)) \
        / jnp.maximum(S[..., 0], 1e-30)


def rotation_angle(x_from, x_to, d):
    """Signed rotation angle about propagation dir d taking frame x-axis
    x_from to x_to (all (..., 3), x ⊥ d)."""
    cosr = vec.dot(x_from, x_to)
    sinr = vec.dot(jnp.cross(d, x_from), x_to)
    return jnp.arctan2(sinr, cosr)


def rotate(S, theta):
    """Rotate the reference frame by θ about the propagation direction:
    S' = R(2θ) S (reference stokes.hpp frame reorientation)."""
    c = jnp.cos(2.0 * theta)
    s = jnp.sin(2.0 * theta)
    I, Q, U, V = S[..., 0], S[..., 1], S[..., 2], S[..., 3]
    return jnp.stack([I, c * Q + s * U, -s * Q + c * U, V], axis=-1)


def reorient(S, x_from, x_to, d):
    """Re-express S given w.r.t. transverse axis x_from in the frame with
    transverse axis x_to (same propagation direction d)."""
    return rotate(S, rotation_angle(x_from, x_to, d))
