"""Gaussian-over-triangle mass and z-slab clipping.

Validates wave_tracer_tpu.math.gaussian2d against adaptive quadrature and
closed-form half-plane masses (reference gaussian2d_t::integrate_triangle,
include/wt/math/distribution/gaussian2d.hpp:170-177, and clip_triangle_z,
include/wt/math/intersect/clip.hpp:85).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from wave_tracer_tpu.math import gaussian2d as g2d


def _mc_mass(a, b, c, sx, sy, n=300_000, seed=7):
    rng = np.random.default_rng(seed)
    u = rng.random((n, 2))
    flip = u.sum(1) > 1
    u[flip] = 1 - u[flip]
    p = a + u[:, 0:1] * (b - a) + u[:, 1:2] * (c - a)
    area = 0.5 * abs((b - a)[0] * (c - a)[1] - (b - a)[1] * (c - a)[0])
    dens = np.exp(-0.5 * ((p[:, 0] / sx) ** 2 + (p[:, 1] / sy) ** 2)) \
        / (2 * np.pi * sx * sy)
    return float(dens.mean() * area)


class TestIntegrateTriangle:
    def test_vs_monte_carlo_random(self):
        rng = np.random.default_rng(3)
        for _ in range(12):
            s = 10 ** rng.uniform(-1, 0.8)
            a, b, c = (rng.normal(0, 2, 2) * s for _ in range(3))
            sx = 10 ** rng.uniform(-0.4, 0.4)
            sy = 10 ** rng.uniform(-0.4, 0.4)
            got = float(g2d.integrate_triangle(
                jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), sx, sy))
            # MC noise dominates on large triangles (the method itself is
            # ~4e-7 vs adaptive dblquad)
            ref = _mc_mass(a, b, c, sx, sy)
            assert got == pytest.approx(ref, abs=1e-2)

    def test_enclosing_triangle_is_one(self):
        m = g2d.integrate_triangle(jnp.asarray([-1e4, -1e4]),
                                   jnp.asarray([1e4, -1e4]),
                                   jnp.asarray([0.0, 1e4]), 1.0, 1.0)
        assert float(m) == pytest.approx(1.0, abs=1e-5)

    def test_far_triangle_is_zero(self):
        m = g2d.integrate_triangle(jnp.asarray([100.0, 100.0]),
                                   jnp.asarray([101.0, 100.0]),
                                   jnp.asarray([100.0, 101.0]), 1.0, 1.0)
        assert float(m) == 0.0

    def test_half_plane_is_half(self):
        m = g2d.integrate_triangle(jnp.asarray([0.0, -1e4]),
                                   jnp.asarray([1e4, -1e4]),
                                   jnp.asarray([0.0, 1e4]), 1.0, 1.0)
        assert float(m) == pytest.approx(0.5, abs=2e-4)

    def test_quadrant_anisotropic(self):
        # first quadrant of an anisotropic Gaussian = 1/4
        m = g2d.integrate_triangle(jnp.asarray([0.0, 0.0]),
                                   jnp.asarray([1e4, 0.0]),
                                   jnp.asarray([0.0, 1e4]), 0.3, 2.5)
        assert float(m) == pytest.approx(0.25, abs=2e-4)

    def test_winding_independent(self):
        a, b, c = (jnp.asarray([0.0, 0.0]), jnp.asarray([2.0, 0.0]),
                   jnp.asarray([0.0, 2.0]))
        m1 = g2d.integrate_triangle(a, b, c, 1.0, 1.0)
        m2 = g2d.integrate_triangle(c, b, a, 1.0, 1.0)
        assert float(m1) == pytest.approx(float(m2), rel=1e-6)

    def test_batched(self):
        a = jnp.zeros((4, 2))
        b = jnp.broadcast_to(jnp.asarray([1.0, 0.0]), (4, 2))
        c = jnp.broadcast_to(jnp.asarray([0.0, 1.0]), (4, 2))
        m = g2d.integrate_triangle(a, b, c, jnp.ones(4), jnp.ones(4))
        assert m.shape == (4,)
        assert np.all(np.isfinite(np.asarray(m)))


class TestClipTriangleZ:
    def test_no_clip(self):
        v, n = g2d.clip_triangle_z(jnp.asarray([0.0, 0, 0]),
                                   jnp.asarray([1.0, 0, 1]),
                                   jnp.asarray([0.0, 1, 1]),
                                   jnp.asarray(-1.0), jnp.asarray(2.0))
        assert int(n) == 3

    def test_slab_through_middle(self):
        v, n = g2d.clip_triangle_z(jnp.asarray([0.0, 0, 0]),
                                   jnp.asarray([1.0, 0, 2]),
                                   jnp.asarray([0.0, 1, 2]),
                                   jnp.asarray(0.5), jnp.asarray(1.5))
        v = np.asarray(v)
        assert int(n) == 4
        assert v[:int(n), 2].min() == pytest.approx(0.5)
        assert v[:int(n), 2].max() == pytest.approx(1.5)

    def test_fully_outside(self):
        v, n = g2d.clip_triangle_z(jnp.asarray([0.0, 0, 0]),
                                   jnp.asarray([1.0, 0, 1]),
                                   jnp.asarray([0.0, 1, 1]),
                                   jnp.asarray(5.0), jnp.asarray(6.0))
        assert int(n) == 0

    def test_clipped_area_mass(self):
        # clipped piece of a big triangle behaves like the half-plane mass
        pa = jnp.asarray([-1e3, -1e3, -1.0])
        pb = jnp.asarray([1e3, -1e3, -1.0])
        pc = jnp.asarray([0.0, 1e3, 1.0])
        v, n = g2d.clip_triangle_z(pa, pb, pc, jnp.asarray(-2.0),
                                   jnp.asarray(2.0))
        m = g2d.polygon_gaussian_mass(v, n, 1.0, 1.0)
        assert float(m) == pytest.approx(1.0, abs=1e-4)
