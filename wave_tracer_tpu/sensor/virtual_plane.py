"""Virtual-plane coverage sensor (signal maps).

Reference include/wt/sensor/virtual_plane_sensor.hpp:206 — a non-imaging
plane in space whose texels are sensing elements; forward-transport beams
connect to it directly (`Si`), producing e.g. GHz coverage maps. Importance
is 1/(π·element_area) (:165-170).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from wave_tracer_tpu.sensor.response import Response


@dataclass
class VirtualPlaneSensor:
    width: int = 256
    height: int = 64
    extent: tuple = (1.0, 0.25)        # physical extents (x, y) in metres
    alpha: float = math.radians(0.001)  # acceptance half-angle
    to_world: np.ndarray = field(default_factory=lambda: np.eye(4))
    samples: int = 16
    response: Response = field(default_factory=Response)
    rfilter_scale: float = 1.0
    ray_trace_only: bool = False
    polarimetric: bool = False
    id: str = "coverage"
    beam_sigma_pixels: float = 0.25

    @property
    def rfilter_sigma(self):
        return self.beam_sigma_pixels * self.rfilter_scale

    def plane_basis(self):
        M = np.asarray(self.to_world, np.float64)
        return M[:3, 3], M[:3, 0], M[:3, 1], M[:3, 2]  # o, x, y, normal(z)

    def element_area(self) -> float:
        return (self.extent[0] / self.width) * (self.extent[1] / self.height)

    def importance(self) -> float:
        """W = 1/(π·A_element) (virtual_plane_sensor.hpp:165-170)."""
        return 1.0 / (math.pi * self.element_area())

    def sample_point(self, u2):
        """Uniformly sample a point on the plane (reference
        virtual_plane_sensor.cpp:136-160 sample_direct): returns
        (sp (N, 3) world, pixel_xy (N, 2) element coords, area (scalar),
        normal (3,))."""
        o, xa, ya, n = [jnp.asarray(v, jnp.float32)
                        for v in self.plane_basis()]
        ex, ey = self.extent
        lx = (u2[..., 0] - 0.5) * ex
        ly = (u2[..., 1] - 0.5) * ey
        sp = o + lx[..., None] * xa + ly[..., None] * ya
        px = u2[..., 0] * self.width
        py = (1.0 - u2[..., 1]) * self.height
        return sp, jnp.stack([px, py], axis=-1), float(ex * ey), n

    def intersect(self, ro, rd):
        """Ray ∩ plane: returns (t (N,), pixel_xy (N,2), inside (N,),
        cos_in (N,)). Used by forward transport to connect beams."""
        o, xa, ya, n = [jnp.asarray(v, jnp.float32)
                        for v in self.plane_basis()]
        denom = jnp.sum(rd * n, axis=-1)
        t = jnp.sum((o - ro) * n, axis=-1) / jnp.where(
            jnp.abs(denom) < 1e-12, 1e-12, denom)
        p = ro + t[..., None] * rd
        lx = jnp.sum((p - o) * xa, axis=-1)
        ly = jnp.sum((p - o) * ya, axis=-1)
        ex, ey = self.extent
        u = lx / ex + 0.5
        v = ly / ey + 0.5
        inside = (t > 0) & (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
        px = u * self.width
        py = (1.0 - v) * self.height
        return t, jnp.stack([px, py], axis=-1), inside, -denom
