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


class TestTrisInBall:
    def test_vs_brute_numpy(self, sphere_geo):
        geo, _ = sphere_geo
        rng = np.random.default_rng(11)
        N, K = 32, 12
        center = rng.normal(0, 0.8, (N, 3)).astype(np.float32)
        radius = rng.uniform(0.05, 0.6, N).astype(np.float32)
        idx, dist, cnt = trace_mod.tris_in_ball(
            geo, jnp.asarray(center), jnp.asarray(radius), K)
        idx, dist, cnt = map(np.asarray, (idx, dist, cnt))

        p0 = np.asarray(geo.p0)
        e1 = np.asarray(geo.e1)
        e2 = np.asarray(geo.e2)
        gn = np.asarray(geo.geo_n)

        def tri_dist(p, i):
            a, b, c = p0[i], p0[i] + e1[i], p0[i] + e2[i]
            # dense sample of the triangle as ground truth
            u, v = np.meshgrid(np.linspace(0, 1, 40),
                               np.linspace(0, 1, 40))
            m = u + v <= 1
            pts = (a + u[m][:, None] * (b - a) + v[m][:, None] * (c - a))
            return np.linalg.norm(pts - p, axis=1).min()

        for n in range(N):
            truth = np.array([tri_dist(center[n], i)
                              for i in range(len(p0))])
            expect = np.sort(np.nonzero(truth <= radius[n])[0])
            got = np.sort(idx[n][idx[n] >= 0])
            if len(expect) <= K:
                # every in-ball triangle must be found (sampled truth is
                # approximate near the boundary: allow eps slack)
                missing = set(expect) - set(got)
                for i in missing:
                    assert truth[i] >= radius[n] - 2e-3
            assert cnt[n] == (idx[n] >= 0).sum()
            # reported distances are exact point-tri distances
            for j in range(cnt[n]):
                assert dist[n, j] <= radius[n] + 1e-6

    def test_empty_far_away(self, sphere_geo):
        geo, _ = sphere_geo
        idx, dist, cnt = trace_mod.tris_in_ball(
            geo, jnp.asarray([[50.0, 0, 0]]), jnp.asarray([0.5]), 8)
        assert int(cnt[0]) == 0
        assert np.all(np.asarray(idx) == -1)


class TestTrisNearRay:
    def test_direct_hit_and_graze(self, sphere_geo):
        geo, _ = sphere_geo
        # ray through the sphere centre: triangles on the entry side show
        # up at their hit parameter with distance 0
        ro = jnp.asarray([[0.0, 0, -3]])
        rd = jnp.asarray([[0.0, 0, 1]])
        idx, z, cnt = trace_mod.tris_near_ray(
            geo, ro, rd, jnp.asarray([0.05]), jnp.asarray([0.0]),
            jnp.asarray([10.0]), 16)
        assert int(cnt[0]) > 0
        # the earliest encounter ~ the front of the unit sphere (z ≈ 2)
        assert abs(float(z[0, 0]) - 2.0) < 0.1

    def test_miss_with_envelope_capture(self, sphere_geo):
        geo, _ = sphere_geo
        # ray passes 1.2 units from the centre: misses, but a swept
        # envelope of radius 0.5 at z≈3 sweeps triangles near tangency
        ro = jnp.asarray([[1.2, 0, -3]])
        rd = jnp.asarray([[0.0, 0, 1]])
        idx0, z0, cnt0 = trace_mod.tris_near_ray(
            geo, ro, rd, jnp.asarray([0.01]), jnp.asarray([0.0]),
            jnp.asarray([10.0]), 16)
        assert int(cnt0[0]) == 0
        idx1, z1, cnt1 = trace_mod.tris_near_ray(
            geo, ro, rd, jnp.asarray([0.5]), jnp.asarray([0.0]),
            jnp.asarray([10.0]), 16)
        assert int(cnt1[0]) > 0

    def test_ordered_by_z(self, sphere_geo):
        geo, _ = sphere_geo
        ro = jnp.asarray([[0.0, 0, -3]])
        rd = jnp.asarray([[0.0, 0, 1]])
        idx, z, cnt = trace_mod.tris_near_ray(
            geo, ro, rd, jnp.asarray([0.3]), jnp.asarray([0.05]),
            jnp.asarray([10.0]), 16)
        zz = np.asarray(z[0])[: int(cnt[0])]
        assert (np.diff(zz) >= -1e-6).all()


class TestClusteredTriQueries:
    """Clustered two-level cone/ball triangle queries vs the brute
    oracles (reference BVH cone walk src/ads/bvh8w.cpp:233-318 and ball
    traversal :610-736 — here cluster-sphere pretest + exact tests)."""

    @pytest.fixture(scope="class")
    def big_geo(self):
        soup = mesh.sphere([0, 0, 0], 1.0, tessellation=48)  # 9216 tris
        geo, _ = make_geo(soup)
        clusters = trace_mod.build_tri_clusters(geo.p0, geo.e1, geo.e2)
        return geo, clusters

    def _random_cones(self, n, seed=0):
        from wave_tracer_tpu.wave.envelope import EnvState
        r = np.random.default_rng(seed)
        # origins outside the sphere, aimed at points near it
        ro = r.normal(size=(n, 3))
        ro = 3.0 * ro / np.linalg.norm(ro, axis=1, keepdims=True)
        aim = 0.5 * r.normal(size=(n, 3))
        rd = aim - ro
        rd /= np.linalg.norm(rd, axis=1, keepdims=True)
        x = np.cross(rd, [0.0, 0.57, 0.8])
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        env = EnvState(x=jnp.asarray(x, jnp.float32),
                       x0=jnp.asarray(r.uniform(0.005, 0.05, n),
                                      jnp.float32),
                       ta=jnp.asarray(r.uniform(0.0, 0.08, n),
                                      jnp.float32),
                       e=jnp.ones((n,), jnp.float32))
        return (jnp.asarray(ro, jnp.float32), jnp.asarray(rd, jnp.float32),
                env)

    def test_cone_matches_brute(self, big_geo):
        geo, clusters = big_geo
        ro, rd, env = self._random_cones(64)
        zmax = jnp.full((64,), 10.0)
        K = 8
        ib, zb, cb = trace_mod.tris_near_cone(geo, ro, rd, env, zmax, K)
        ic, zc, cc = trace_mod.tris_near_cone_clustered(
            geo, clusters, ro, rd, env, zmax, K)
        ib, zb, cb = map(np.asarray, (ib, zb, cb))
        ic, zc, cc = map(np.asarray, (ic, zc, cc))
        # narrow beams touch few clusters: the clustered result must
        # recover the brute K-nearest set almost everywhere
        hits = matches = 0
        for ln in range(64):
            want = set(ib[ln][: cb[ln]].tolist())
            got = set(ic[ln][: cc[ln]].tolist())
            hits += len(want)
            matches += len(want & got)
        assert hits > 0
        recall = matches / max(hits, 1)
        assert recall >= 0.98, f"clustered cone recall {recall}"
        # entry distances agree exactly where the same tri was found
        for ln in range(4):
            common = {t: z for t, z in zip(ib[ln], zb[ln]) if t >= 0}
            for t, z in zip(ic[ln], zc[ln]):
                if t in common:
                    np.testing.assert_allclose(z, common[t], rtol=1e-4)

    def test_ball_matches_brute(self, big_geo):
        geo, clusters = big_geo
        r = np.random.default_rng(1)
        centers = jnp.asarray(r.normal(scale=1.1, size=(64, 3)),
                              jnp.float32)
        radii = jnp.asarray(r.uniform(0.02, 0.15, 64), jnp.float32)
        ib, db, cb = trace_mod.tris_in_ball(geo, centers, radii, 8)
        ic, dc, cc = trace_mod.tris_in_ball_clustered(
            geo, clusters, centers, radii, 8)
        ib, db, cb = map(np.asarray, (ib, db, cb))
        ic, dc, cc = map(np.asarray, (ic, dc, cc))
        hits = matches = 0
        for ln in range(64):
            want = set(ib[ln][: cb[ln]].tolist())
            got = set(ic[ln][: cc[ln]].tolist())
            hits += len(want)
            matches += len(want & got)
        assert hits > 0
        recall = matches / max(hits, 1)
        assert recall >= 0.98, f"clustered ball recall {recall}"

    def test_cluster_partition(self, big_geo):
        geo, clusters = big_geo
        order = np.asarray(clusters.order)
        assert sorted(order.tolist()) == list(range(geo.num_tris))
        starts = np.asarray(clusters.start)
        counts = np.asarray(clusters.count)
        assert (starts[1:] == starts[:-1] + counts[:-1]).all()
        assert counts.sum() == geo.num_tris


class TestTwoPassConeQuery:
    def test_matches_brute(self):
        """tris_near_cone_2pass (bounding-sphere pretest + exact test on
        top-J candidates) vs the exact brute sweep."""
        from wave_tracer_tpu.wave.envelope import EnvState
        soup = mesh.sphere([0, 0, 0], 1.0, tessellation=48)
        geo, _ = make_geo(soup)
        n = 64
        r = np.random.default_rng(3)
        ro = r.normal(size=(n, 3))
        ro = 3.0 * ro / np.linalg.norm(ro, axis=1, keepdims=True)
        aim = 0.5 * r.normal(size=(n, 3))
        rd = aim - ro
        rd /= np.linalg.norm(rd, axis=1, keepdims=True)
        x = np.cross(rd, [0.0, 0.57, 0.8])
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        env = EnvState(x=jnp.asarray(x, jnp.float32),
                       x0=jnp.asarray(r.uniform(0.005, 0.05, n),
                                      jnp.float32),
                       ta=jnp.asarray(r.uniform(0.0, 0.08, n),
                                      jnp.float32),
                       e=jnp.ones((n,), jnp.float32))
        ro = jnp.asarray(ro, jnp.float32)
        rd = jnp.asarray(rd, jnp.float32)
        zmax = jnp.full((n,), 10.0)
        ib, zb, cb = trace_mod.tris_near_cone(geo, ro, rd, env, zmax, 8)
        i2, z2, c2 = trace_mod.tris_near_cone_2pass(geo, ro, rd, env,
                                                    zmax, 8)
        ib, cb = np.asarray(ib), np.asarray(cb)
        i2, c2 = np.asarray(i2), np.asarray(c2)
        hits = matches = 0
        for ln in range(n):
            want = set(ib[ln][: cb[ln]].tolist())
            got = set(i2[ln][: c2[ln]].tolist())
            hits += len(want)
            matches += len(want & got)
        assert hits > 0
        recall = matches / max(hits, 1)
        assert recall >= 0.98, f"2pass cone recall {recall}"
