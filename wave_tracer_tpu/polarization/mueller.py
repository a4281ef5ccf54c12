"""Mueller operators — batched (..., 4, 4) jnp arrays.

Constructors and frame-aware application mirroring reference
include/wt/interaction/polarimetric/mueller.hpp:217-346: identity, frame
rotation, linear polarizer, depolarizer, and Fresnel interaction matrices
built from complex Jones amplitudes in the S/P basis. Backward-transport
beams compose these along the path; sensors contract them against source
Stokes vectors (beam.hpp:562-603).
"""

from __future__ import annotations

import jax.numpy as jnp


def identity(batch_shape=()):
    return jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                            tuple(batch_shape) + (4, 4))


def scaled(scale):
    """Isotropic scale (energy factor) — scale (...,) → (..., 4, 4)."""
    return scale[..., None, None] * jnp.eye(4, dtype=jnp.float32)


def rotation(theta):
    """Reference-frame rotation R(2θ) as a Mueller matrix."""
    c = jnp.cos(2.0 * theta)
    s = jnp.sin(2.0 * theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    rows = [
        jnp.stack([o, z, z, z], axis=-1),
        jnp.stack([z, c, s, z], axis=-1),
        jnp.stack([z, -s, c, z], axis=-1),
        jnp.stack([z, z, z, o], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def depolarizer(scale):
    """Ideal depolarizer: keeps I (times scale), kills Q,U,V."""
    z = jnp.zeros_like(scale)
    rows = [
        jnp.stack([scale, z, z, z], axis=-1),
        jnp.stack([z, z, z, z], axis=-1),
        jnp.stack([z, z, z, z], axis=-1),
        jnp.stack([z, z, z, z], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def linear_polarizer(theta):
    """Ideal linear polarizer at angle θ to the frame x-axis."""
    c = jnp.cos(2.0 * theta)
    s = jnp.sin(2.0 * theta)
    z = jnp.zeros_like(theta)
    h = 0.5 * jnp.ones_like(theta)
    rows = [
        jnp.stack([h, h * c, h * s, z], axis=-1),
        jnp.stack([h * c, h * c * c, h * s * c, z], axis=-1),
        jnp.stack([h * s, h * s * c, h * s * s, z], axis=-1),
        jnp.stack([z, z, z, z], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def from_jones_sp(a_s, a_p, scale=None):
    """Mueller matrix of a diagonal Jones operator diag(a_s, a_p) in the
    S/P basis (Fresnel reflection/transmission; reference
    mueller.hpp fresnel constructors). a_s/a_p complex (...,).

    Rows/cols ordered (I, Q, U, V) with Q = |E_s|² − |E_p|².
    """
    As = jnp.abs(a_s) ** 2
    Ap = jnp.abs(a_p) ** 2
    cross = a_s * jnp.conj(a_p)
    re = jnp.real(cross)
    im = jnp.imag(cross)
    z = jnp.zeros_like(As)
    m00 = 0.5 * (As + Ap)
    m01 = 0.5 * (As - Ap)
    rows = [
        jnp.stack([m00, m01, z, z], axis=-1),
        jnp.stack([m01, m00, z, z], axis=-1),
        jnp.stack([z, z, re, im], axis=-1),
        jnp.stack([z, z, -im, re], axis=-1),
    ]
    M = jnp.stack(rows, axis=-2)
    if scale is not None:
        M = scale[..., None, None] * M
    return M


def apply(M, S):
    """M (..., 4, 4) @ S (..., 4)."""
    return jnp.einsum("...ij,...j->...i", M, S)


def compose(M2, M1):
    """Operator composition: first M1, then M2."""
    return jnp.einsum("...ij,...jk->...ik", M2, M1)
