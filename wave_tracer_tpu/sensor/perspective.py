"""Perspective (pinhole) sensor: batched importance-beam sourcing.

Reference include/wt/sensor/perspective.hpp:192-262: rays through jittered
pixel positions, importance W=1 per unit flux; beams are sourced with
intentionally sub-diffraction phase-space extents (tan α set by the pixel
footprint at the image plane, spatial σ = 0.25 px) — carried here as the
beam envelope parameters for the wave integrator.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from wave_tracer_tpu.sensor.response import Response


@dataclass
class PerspectiveSensor:
    width: int = 256
    height: int = 256
    fov: float = math.radians(45.0)    # along image x
    to_world: np.ndarray = field(default_factory=lambda: np.eye(4))
    samples: int = 16
    response: Response = field(default_factory=Response)
    rfilter_scale: float = 1.0
    ray_trace_only: bool = False
    polarimetric: bool = False
    id: str = "camera"
    # beam sourcing (perspective.hpp:192-206): σ_spatial = .25 px at the
    # aperture, tan α = pixel extent at unit image-plane distance
    beam_sigma_pixels: float = 0.25

    @property
    def rfilter_sigma(self):
        return self.beam_sigma_pixels * self.rfilter_scale

    def camera_basis(self):
        """(origin, right, up, forward) world-space camera frame."""
        M = np.asarray(self.to_world, np.float64)
        origin = M[:3, 3]
        right = M[:3, 0]
        up = M[:3, 1]
        forward = M[:3, 2]
        return origin, right, up, forward

    def generate_rays(self, pixel_xy, jitter):
        """Rays through pixels. pixel_xy (N, 2) i32 [x, y]; jitter (N, 2)
        in [0,1). Returns (ro (N,3), rd (N,3), tan_alpha ())."""
        o, r, u, f = [jnp.asarray(v, jnp.float32)
                      for v in self.camera_basis()]
        W, H = self.width, self.height
        tan_half = math.tan(0.5 * self.fov)
        px = (pixel_xy[..., 0].astype(jnp.float32) + jitter[..., 0])
        py = (pixel_xy[..., 1].astype(jnp.float32) + jitter[..., 1])
        ndc_x = (2.0 * px / W - 1.0) * tan_half
        ndc_y = (1.0 - 2.0 * py / H) * tan_half * (H / W)
        d = ndc_x[..., None] * r + ndc_y[..., None] * u + f
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        ro = jnp.broadcast_to(o, d.shape)
        # pixel angular extent at unit image-plane distance
        tan_alpha = 2.0 * tan_half / W
        return ro, d, tan_alpha

    def project(self, p_world):
        """World point → (pixel_xy (N,2), visible (N,), cos_theta (N,),
        dir_to_p (N,3), dist (N,)). Used by light tracing / NEE-to-sensor."""
        o, r, u, f = [jnp.asarray(v, jnp.float32)
                      for v in self.camera_basis()]
        W, H = self.width, self.height
        tan_half = math.tan(0.5 * self.fov)
        v = p_world - o
        dist = jnp.linalg.norm(v, axis=-1)
        d = v / jnp.maximum(dist, 1e-12)[..., None]
        z = jnp.sum(d * f, axis=-1)
        x = jnp.sum(d * r, axis=-1)
        y = jnp.sum(d * u, axis=-1)
        visible = z > 1e-6
        zs = jnp.maximum(z, 1e-6)
        ndc_x = x / zs / tan_half
        ndc_y = y / zs / (tan_half * (H / W))
        px = (ndc_x + 1.0) * 0.5 * W
        py = (1.0 - ndc_y) * 0.5 * H
        visible &= (px >= 0) & (px < W) & (py >= 0) & (py < H)
        return jnp.stack([px, py], axis=-1), visible, z, d, dist

    def importance(self):
        """W — emitted importance per unit flux (perspective.hpp:218-222)."""
        return 1.0


def lookat_matrix(origin, target, up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """Camera-to-world from lookat (reference transform loader semantics:
    +x right, +y up, +z towards target)."""
    origin = np.asarray(origin, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    fwd = target - origin
    fwd = fwd / np.linalg.norm(fwd)
    # reference transform.hpp lookat: x = cross(up, d), y = cross(d, x)
    right = np.cross(up, fwd)
    nr = np.linalg.norm(right)
    if nr < 1e-9:
        # up parallel to forward: pick another up
        up = np.array([1.0, 0.0, 0.0]) if abs(fwd[0]) < 0.9 \
            else np.array([0.0, 0.0, 1.0])
        right = np.cross(up, fwd)
        nr = np.linalg.norm(right)
    right = right / nr
    up2 = np.cross(fwd, right)
    M = np.eye(4)
    M[:3, 0] = right
    M[:3, 1] = up2
    M[:3, 2] = fwd
    M[:3, 3] = origin
    return M
