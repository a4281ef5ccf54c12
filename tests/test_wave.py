"""Wave-core tests: special functions, elliptic cones, beam geometry,
edge classification, UTD coefficients."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from wave_tracer_tpu.accel import edges as edges_mod
from wave_tracer_tpu.geometry import mesh as mesh_mod
from wave_tracer_tpu.core.transform import Transform
from wave_tracer_tpu.math import special
from wave_tracer_tpu.wave import beam, cone, utd


class TestSpecial:
    def test_faddeeva_vs_scipy(self):
        import scipy.special as ss
        rng = np.random.default_rng(0)
        z = rng.uniform(-6, 6, 500) + 1j * rng.uniform(0, 6, 500)
        w = np.asarray(special.faddeeva(jnp.asarray(z, jnp.complex64)))
        ref = ss.wofz(z)
        err = np.abs(w - ref) / np.maximum(np.abs(ref), 1e-30)
        assert err.max() < 1e-4    # complex64 path

    def test_fresnel_vs_scipy(self):
        import scipy.special as ss
        t = np.linspace(-4, 4, 201)
        S_ref, C_ref = ss.fresnel(t)
        C, S = special.fresnel_cs(jnp.asarray(t, jnp.float32))
        np.testing.assert_allclose(np.asarray(C), C_ref, atol=5e-5)
        np.testing.assert_allclose(np.asarray(S), S_ref, atol=5e-5)

    def test_utd_transition_limits(self):
        x = jnp.asarray([1e-6, 0.1, 1.0, 10.0, 1e4], jnp.float32)
        F = np.asarray(special.utd_transition(x))
        assert abs(F[-1] - 1.0) < 1e-3        # F(x→∞) = 1
        assert abs(F[0]) < 5e-3               # F(x→0) = 0
        assert np.isfinite(F).all()


class TestCone:
    def test_contains_axes(self):
        c = cone.ray_cone(jnp.zeros((1, 3)),
                          jnp.asarray([[0.0, 0.0, 1.0]]),
                          tan_alpha=jnp.asarray([0.1]))
        a, b = c.axes(jnp.asarray([2.0]))
        np.testing.assert_allclose(np.asarray(a), [0.2], atol=1e-6)
        np.testing.assert_allclose(np.asarray(b), [0.2], atol=1e-6)
        inside = c.contains(jnp.asarray([[0.1, 0.0, 2.0]]))
        outside = c.contains(jnp.asarray([[0.3, 0.0, 2.0]]))
        assert bool(inside[0]) and not bool(outside[0])

    def test_svd2x2(self):
        rng = np.random.default_rng(1)
        M = rng.normal(size=(64, 2, 2))
        cU, sU, s1, s2, _ = cone.svd2x2(
            jnp.asarray(M[:, 0, 0]), jnp.asarray(M[:, 0, 1]),
            jnp.asarray(M[:, 1, 0]), jnp.asarray(M[:, 1, 1]))
        ref = np.linalg.svd(M, compute_uv=False)
        np.testing.assert_allclose(np.asarray(s1), ref[:, 0], rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(s2), ref[:, 1], rtol=1e-5,
                                   atol=1e-6)

    def test_cone_through_ellipse_circle(self):
        # circular footprint, normal incidence → isotropic cone with x0 = r
        N = 1
        ex = jnp.asarray([[0.05, 0.0, 0.0]])
        ey = jnp.asarray([[0.0, 0.05, 0.0]])
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        ro = jnp.zeros((N, 3))
        rd = jnp.asarray([[0.0, 0.0, 1.0]])
        c, sid = cone.cone_through_ellipse(ex, ey, n, ro, rd,
                                           jnp.asarray([0.01]))
        np.testing.assert_allclose(float(c.x0[0]), 0.05, rtol=1e-5)
        np.testing.assert_allclose(float(c.e[0]), 1.0, atol=1e-4)
        # normal incidence: no self-intersection extent
        assert float(sid[0]) < 1e-5

    def test_cone_through_ellipse_oblique(self):
        # 45° incidence: footprint stretched; projected back gives e>1 and
        # positive self-intersection distance
        s = math.sqrt(0.5)
        ex = jnp.asarray([[0.1 / s, 0.0, 0.0]])  # stretched along x
        ey = jnp.asarray([[0.0, 0.1, 0.0]])
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        rd = jnp.asarray([[s, 0.0, s]])
        c, sid = cone.cone_through_ellipse(ex, ey, n, jnp.zeros((1, 3)),
                                           rd, jnp.asarray([0.01]))
        assert float(sid[0]) > 0.01
        assert float(c.x0[0]) == pytest.approx(0.1, rel=1e-3)


class TestBeamGeometry:
    def test_mub_roundtrip(self):
        k = 2 * np.pi / 550e-9
        ta = beam.minimum_uncertainty_tan_alpha(jnp.asarray(1e-8), k)
        s = beam.sbp(jnp.asarray(1e-8), ta, k)
        np.testing.assert_allclose(float(s), beam.MUB_SBP, rtol=1e-5)

    def test_make_mub_enlarges(self):
        k = 2 * np.pi / 550e-9
        se, ta = beam.make_mub(jnp.asarray(1e-14), jnp.asarray(1e-6), k)
        assert bool(beam.is_mub(se, ta, k))
        # already-physical extents unchanged
        se0 = jnp.asarray(1e-6)
        ta0 = jnp.asarray(0.1)
        se2, ta2 = beam.make_mub(se0, ta0, k)
        np.testing.assert_allclose(float(se2), 1e-6)
        np.testing.assert_allclose(float(ta2), 0.1)


class TestEdges:
    def test_cube_edges(self):
        soup = mesh_mod.cube(1.0)
        et = edges_mod.classify_edges(soup.positions, soup.geo_n)
        # cube: 12 geometric 90° edges (+12 face diagonals are coplanar
        # and discarded)
        assert et.count == 12
        np.testing.assert_allclose(np.asarray(et.alpha), math.pi / 2,
                                   atol=1e-5)
        # wedge normals point outwards and tangents into faces
        dots = np.sum(np.asarray(et.n1) * np.asarray(et.n2), axis=-1)
        np.testing.assert_allclose(dots, 0.0, atol=1e-5)

    def test_boundary_edges(self):
        soup = mesh_mod.rectangle(1.0)
        et = edges_mod.classify_edges(soup.positions, soup.geo_n)
        # 4 boundary edges (the shared diagonal is interior + coplanar)
        assert et.count == 4
        n1 = np.asarray(et.n1)
        n2 = np.asarray(et.n2)
        np.testing.assert_allclose(n1, -n2, atol=1e-6)
        np.testing.assert_allclose(np.asarray(et.alpha), 0.0, atol=1e-5)

    def test_edges_in_ball(self):
        soup = mesh_mod.cube(1.0)
        et = edges_mod.classify_edges(soup.positions, soup.geo_n)
        center = jnp.asarray([[0.5, 0.5, 0.5], [10.0, 0.0, 0.0]])
        radius = jnp.asarray([0.3, 0.1])
        idx, dist, cnt = edges_mod.edges_in_ball(et, center, radius, K=8)
        # corner of the cube: 3 edges meet within 0.3
        assert int(cnt[0]) == 3
        assert int(cnt[1]) == 0


class TestUTD:
    def test_half_plane_magnitude(self):
        """Knife-edge (α=0, n=2) diffraction coefficient magnitude matches
        the classical Keller/UTD closed form far from shadow boundaries."""
        k = jnp.asarray([2 * np.pi / 0.05])   # λ=0.05 (scene units)
        e = jnp.asarray([[0.0, 0.0, 1.0]])
        tff = jnp.asarray([[1.0, 0.0, 0.0]])
        nff = jnp.asarray([[0.0, 1.0, 0.0]])
        ro = jnp.asarray([10.0])
        phii = 0.6
        phio = 2.2
        wi = jnp.asarray([[np.cos(phii), np.sin(phii), 0.0]])
        wo = jnp.asarray([[np.cos(phio), np.sin(phio), 0.0]])
        Ds, Dh = utd.utd_coefficients(k, wi, wo, ro, e, tff, nff,
                                      jnp.asarray([0.0]))
        n = 2.0
        kk = float(k[0])
        # far from transition regions F≈1: D ∝ cot sums
        def cot(x):
            return np.cos(x) / np.sin(x)
        D0 = np.exp(-1j * np.pi / 4) / (2 * n * np.sqrt(2 * np.pi * kk)
                                        * np.sqrt(10.0))
        d1 = -cot((np.pi + (phii - phio)) / (2 * n))
        d2 = -cot((np.pi - (phii - phio)) / (2 * n))
        d3 = -cot((np.pi + (phii + phio)) / (2 * n))
        d4 = -cot((np.pi - (phii + phio)) / (2 * n))
        Ds_ref = -D0 * (d1 + d2 - (d3 + d4))
        Dh_ref = -D0 * (d1 + d2 + (d3 + d4))
        np.testing.assert_allclose(np.asarray(Ds)[0], Ds_ref, rtol=5e-2)
        np.testing.assert_allclose(np.asarray(Dh)[0], Dh_ref, rtol=5e-2)

    def test_fermat_point_midplane(self):
        # src and dst symmetric about the edge midpoint → p at the middle
        v = jnp.asarray([[0.0, 0.0, 0.0]])
        e = jnp.asarray([[0.0, 0.0, 1.0]])
        tff = jnp.asarray([[1.0, 0.0, 0.0]])
        nff = jnp.asarray([[0.0, 1.0, 0.0]])
        src = jnp.asarray([[1.0, 1.0, 0.5]])
        dst = jnp.asarray([[-1.0, 1.0, -0.5]])
        p, ok = utd.fermat_point_to(v, e, tff, nff, jnp.asarray([2.0]),
                                    src, dst)
        assert bool(ok[0])
        np.testing.assert_allclose(np.asarray(p)[0], [0, 0, 0], atol=1e-6)
