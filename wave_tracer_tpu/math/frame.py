"""Orthonormal frames as batched (t, b, n) triplets.

Mirrors the behaviour of reference include/wt/math/frame.hpp (frame_t with
to_local/to_world, build_orthogonal_frame, build_shading_frame) as pure jnp
functions over (..., 3) arrays. A frame is a flax.struct pytree so it can ride
inside beam state through jit/scan.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from wave_tracer_tpu.math import vec


@struct.dataclass
class Frame:
    t: jnp.ndarray  # tangent   (..., 3)
    b: jnp.ndarray  # bitangent (..., 3)
    n: jnp.ndarray  # normal    (..., 3)

    def to_local(self, v):
        return jnp.stack([vec.dot(v, self.t), vec.dot(v, self.b),
                          vec.dot(v, self.n)], axis=-1)

    def to_world(self, v):
        return (v[..., 0:1] * self.t + v[..., 1:2] * self.b
                + v[..., 2:3] * self.n)


def build_orthogonal_frame(n) -> Frame:
    """Arbitrary frame with normal n (reference frame.hpp:159-175).

    Branchless jnp version of the reference's |n.x|>|n.y| split.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    cond = jnp.abs(nx) > jnp.abs(ny)
    sx = 1.0 / jnp.sqrt(jnp.where(cond, nx * nx + nz * nz, ny * ny + nz * nz))
    b = jnp.where(cond[..., None],
                  jnp.stack([sx * nz, jnp.zeros_like(sx), -sx * nx], axis=-1),
                  jnp.stack([jnp.zeros_like(sx), sx * nz, -sx * ny], axis=-1))
    t = jnp.cross(b, n)
    return Frame(t=t, b=b, n=n)


def build_shading_frame(n, dpdu) -> Frame:
    """Frame with normal n and tangent aligned with dpdu (frame.hpp:140-154).

    Falls back to build_orthogonal_frame where dpdu vanishes.
    """
    degenerate = vec.length2(dpdu) < 1e-24
    safe_dpdu = jnp.where(degenerate[..., None],
                          jnp.ones_like(dpdu) * jnp.array([1.0, 0.0, 0.0]),
                          dpdu)
    t = vec.normalize(safe_dpdu - n * vec.vdot(n, safe_dpdu), eps=1e-24)
    b = vec.normalize(jnp.cross(n, t), eps=1e-24)
    t = jnp.cross(b, n)
    fallback = build_orthogonal_frame(n)
    return Frame(
        t=jnp.where(degenerate[..., None], fallback.t, t),
        b=jnp.where(degenerate[..., None], fallback.b, b),
        n=n,
    )


def rotate_frame(R, f: Frame) -> Frame:
    """Apply an orthogonal 3x3 matrix R (..., 3, 3) to the frame."""
    def app(v):
        return jnp.einsum("...ij,...j->...i", R, v)
    return Frame(t=app(f.t), b=app(f.b), n=app(f.n))
