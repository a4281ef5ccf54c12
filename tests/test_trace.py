"""Intersection + traversal tests: brute vs BVH equivalence, known hits."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wave_tracer_tpu.accel import bvh as bvh_mod
from wave_tracer_tpu.accel import trace as trace_mod
from wave_tracer_tpu.geometry import mesh


def make_geo(soup):
    T = soup.num_tris
    b = bvh_mod.build_bvh(soup.positions)
    return trace_mod.from_soup(soup, np.zeros(T), np.zeros(T),
                               np.full(T, -1), b), b


@pytest.fixture(scope="module")
def sphere_geo():
    soup = mesh.sphere([0, 0, 0], 1.0, tessellation=24)
    return make_geo(soup)


class TestBVHBuild:
    def test_structure(self, sphere_geo):
        geo, b = sphere_geo
        assert b.depth() <= bvh_mod.MAX_DEPTH
        # every tri referenced exactly once
        leafs = b.node_count > 0
        total = b.node_count[leafs].sum()
        assert total == len(b.tri_order)
        assert sorted(b.tri_order) == list(range(len(b.tri_order)))

    def test_root_bounds(self, sphere_geo):
        geo, b = sphere_geo
        np.testing.assert_allclose(b.node_min[0], [-1, -1, -1], atol=1e-5)
        np.testing.assert_allclose(b.node_max[0], [1, 1, 1], atol=1e-5)


class TestTrace:
    def test_sphere_hit_distance(self, sphere_geo):
        geo, _ = sphere_geo
        ro = jnp.array([[0.0, 0.0, -5.0]] * 4)
        rd = jnp.array([[0.0, 0.0, 1.0]] * 4)
        t, i, u, v = trace_mod.trace_brute(geo, ro, rd,
                                           jnp.zeros(4), jnp.full(4, 1e9))
        assert (i >= 0).all()
        # icosphere slightly inside the unit sphere
        np.testing.assert_allclose(t, 4.0, atol=0.05)

    def test_miss(self, sphere_geo):
        geo, _ = sphere_geo
        ro = jnp.array([[0.0, 0.0, -5.0]])
        rd = jnp.array([[0.0, 1.0, 0.0]])
        t, i, u, v = trace_mod.trace_brute(geo, ro, rd, jnp.zeros(1),
                                           jnp.full(1, 1e9))
        assert int(i[0]) == -1

    def test_brute_vs_bvh(self, sphere_geo):
        geo, _ = sphere_geo
        key = jax.random.PRNGKey(0)
        N = 512
        ro = jax.random.normal(key, (N, 3)) * 3.0
        rd = jax.random.normal(jax.random.fold_in(key, 1), (N, 3))
        rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        tmin = jnp.zeros(N)
        tmax = jnp.full(N, 1e9)
        tb, ib, ub, vb = trace_mod.trace_brute(geo, ro, rd, tmin, tmax)
        tv, iv, uv, vv = trace_mod.trace_bvh(geo, ro, rd, tmin, tmax)
        hit_b = np.asarray(ib >= 0)
        hit_v = np.asarray(iv >= 0)
        np.testing.assert_array_equal(hit_b, hit_v)
        np.testing.assert_allclose(np.asarray(tb)[hit_b],
                                   np.asarray(tv)[hit_v], rtol=1e-4)

    def test_occlusion(self, sphere_geo):
        geo, _ = sphere_geo
        ro = jnp.array([[0.0, 0.0, -5.0], [0.0, 0.0, -5.0]])
        rd = jnp.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]])
        occ = trace_mod.occluded_brute(geo, ro, rd, jnp.zeros(2),
                                       jnp.full(2, 1e9))
        assert bool(occ[0]) and not bool(occ[1])

    def test_exclude_tri(self, sphere_geo):
        geo, _ = sphere_geo
        ro = jnp.array([[0.0, 0.0, -5.0]])
        rd = jnp.array([[0.0, 0.0, 1.0]])
        t, i, _, _ = trace_mod.trace_brute(geo, ro, rd, jnp.zeros(1),
                                           jnp.full(1, 1e9))
        t2, i2, _, _ = trace_mod.trace_brute(geo, ro, rd, jnp.zeros(1),
                                             jnp.full(1, 1e9),
                                             exclude_tri=i)
        assert int(i2[0]) != int(i[0])

    def test_hit_attributes(self, sphere_geo):
        geo, _ = sphere_geo
        ro = jnp.array([[0.0, 0.0, -5.0]])
        rd = jnp.array([[0.0, 0.0, 1.0]])
        t, i, u, v = trace_mod.trace_brute(geo, ro, rd, jnp.zeros(1),
                                           jnp.full(1, 1e9))
        hit = trace_mod.hit_attributes(geo, ro, rd, t, i, u, v)
        assert bool(hit.valid[0]) and bool(hit.front[0])
        # shading normal ~ -z at the entry point of a unit sphere
        np.testing.assert_allclose(np.asarray(hit.ns[0]), [0, 0, -1],
                                   atol=0.05)
        np.testing.assert_allclose(np.asarray(hit.p[0]), [0, 0, -1],
                                   atol=0.05)

    def test_bigger_mesh_brute_vs_bvh(self):
        # concatenation of several shapes, including degenerate-ish ones
        soups = [mesh.sphere([0, 0, 0], 1.0, tessellation=12),
                 mesh.cube(1.5),
                 mesh.rectangle(4.0),
                 mesh.cylinder([0, -2, 0], [0, 2, 0], 0.7,
                               phi_tessellation=13)]
        soup = mesh.TriangleSoup.concatenate(soups)
        geo, b = make_geo(soup)
        key = jax.random.PRNGKey(7)
        N = 256
        ro = jax.random.normal(key, (N, 3)) * 4.0
        rd = jax.random.normal(jax.random.fold_in(key, 3), (N, 3))
        rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        tb, ib, _, _ = trace_mod.trace_brute(geo, ro, rd, jnp.zeros(N),
                                             jnp.full(N, 1e9))
        tv, iv, _, _ = trace_mod.trace_bvh(geo, ro, rd, jnp.zeros(N),
                                           jnp.full(N, 1e9))
        np.testing.assert_array_equal(np.asarray(ib >= 0),
                                      np.asarray(iv >= 0))
        m = np.asarray(ib >= 0)
        np.testing.assert_allclose(np.asarray(tb)[m], np.asarray(tv)[m],
                                   rtol=1e-4)
