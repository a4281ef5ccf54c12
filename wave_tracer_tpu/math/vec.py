"""Batched 3D vector helpers over trailing-axis-(3,) jnp arrays.

All geometry kernels in this framework operate on SoA batches: a "vec3" is an
array of shape (..., 3). The reference's GLM scalar vectors and its 8-wide AVX
wide-vectors (reference include/wt/math/simd/wide_vector.hpp) both collapse to
this representation — batching is the leading array dimension on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def length2(a):
    return jnp.sum(a * a, axis=-1)


def safe_length(a, eps: float = 1e-30):
    """|a| with a tiny positive floor under the sqrt: d(sqrt)/dx at 0 is
    inf, so an exactly-zero vector (degenerate/invalid lanes) poisons
    JVP/VJP tangents with inf·0 = NaN even when nothing differentiable
    feeds it. Use this in any differentiated transport path."""
    return jnp.sqrt(jnp.maximum(length2(a), eps))


def safe_sqrt(x, eps: float = 1e-30):
    """sqrt with an epsilon floor (NaN-free gradients at 0)."""
    return jnp.sqrt(jnp.maximum(x, eps))


def length(a):
    return jnp.sqrt(length2(a))


def normalize(a, eps: float = 0.0):
    n2 = length2(a)
    if eps:
        n2 = jnp.maximum(n2, eps)
    return a * jnp.expand_dims(jnp.where(n2 > 0, 1.0 / jnp.sqrt(jnp.where(n2 > 0, n2, 1.0)), 0.0), -1)


def cross(a, b):
    return jnp.cross(a, b)


def vdot(a, b):
    """dot with keepdims for broadcasting against vectors."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def reflect(wi, n):
    """Mirror direction of incident wi about normal n (both pointing away
    from surface in the reference's local-frame convention)."""
    return 2.0 * vdot(wi, n) * n - wi


def vec3(x, y, z):
    return jnp.stack(jnp.broadcast_arrays(jnp.asarray(x, jnp.float32),
                                          jnp.asarray(y, jnp.float32),
                                          jnp.asarray(z, jnp.float32)), axis=-1)


def x_(v):
    return v[..., 0]


def y_(v):
    return v[..., 1]


def z_(v):
    return v[..., 2]
