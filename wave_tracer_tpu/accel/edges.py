"""Edge extraction & classification for free-space diffraction.

Build-time equivalent of reference include/wt/ads/edge_classification.hpp:
31-238: find triangle pairs sharing two vertices, build wedge records
carrying both outward face normals, the edge tangent and the wedge angle
α = π − acos(n1·n2); discard near-planar wedges (α > 160° between faces —
i.e. faces nearly coplanar); boundary edges (single face) get n2 = −n1.

Host-side this is a vectorized hash join over quantized vertex positions
(the reference ball-queries the ADS per triangle; a hash join is the
array-sized equivalent). The result is a flat device table the wavefront
integrator queries for edges inside a beam's interaction footprint.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from wave_tracer_tpu.math import vec

# keep wedges with interior angle at most this (reference
# edge_classification.hpp: discards α>160° near-planar wedges)
PLANAR_ANGLE_DEG = 160.0


@struct.dataclass
class EdgeTable:
    p0: jnp.ndarray       # (E, 3) edge endpoint
    p1: jnp.ndarray       # (E, 3)
    e: jnp.ndarray        # (E, 3) unit edge direction p0→p1
    n1: jnp.ndarray       # (E, 3) face-1 outward wedge normal
    n2: jnp.ndarray       # (E, 3) face-2 outward normal (−n1 for boundary)
    t1: jnp.ndarray       # (E, 3) face-1 tangent (⊥ e, pointing into face)
    t2: jnp.ndarray       # (E, 3) face-2 tangent
    alpha: jnp.ndarray    # (E,) wedge opening angle
    length: jnp.ndarray   # (E,)
    center: jnp.ndarray   # (E, 3)
    tri1: jnp.ndarray     # (E,) i32 face-1 triangle (device order)
    tri2: jnp.ndarray     # (E,) i32 (−1 boundary)

    @property
    def count(self):
        return self.p0.shape[0]

    @property
    def pack(self):
        """(E, 24) packed row: p0(0:3) ê(3:6) n1(6:9) n2(9:12) t1(12:15)
        t2(15:18) α(18) len(19) pad — derived on the fly (fused once per
        kernel) so ONE gather serves aperture construction (gathers carry
        a large fixed cost on this backend; p1 = p0 + ê·len)."""
        return jnp.concatenate([
            self.p0, self.e, self.n1, self.n2, self.t1, self.t2,
            self.alpha[:, None], self.length[:, None],
            jnp.zeros((self.count, 4), jnp.float32)], axis=1)


def classify_edges(positions: np.ndarray, geo_n: np.ndarray,
                   quant: float = 1e-6) -> EdgeTable:
    """positions (T, 3, 3) and geometric normals (T, 3) in DEVICE order."""
    T = len(positions)
    if T == 0:
        return _empty()

    scale = max(np.abs(positions).max(), 1.0)
    q = quant * scale
    keys = np.round(positions / q).astype(np.int64)       # (T, 3, 3)

    # every triangle edge: (vertex a, vertex b) with a sorted key pair
    ea = np.concatenate([keys[:, 0], keys[:, 1], keys[:, 2]])
    eb = np.concatenate([keys[:, 1], keys[:, 2], keys[:, 0]])
    pa = np.concatenate([positions[:, 0], positions[:, 1], positions[:, 2]])
    pb = np.concatenate([positions[:, 1], positions[:, 2], positions[:, 0]])
    tri_idx = np.concatenate([np.arange(T)] * 3)

    # canonical (sorted) key per edge for the join
    flip = _lexless(eb, ea)
    ka = np.where(flip[:, None], eb, ea)
    kb = np.where(flip[:, None], ea, eb)
    key = np.concatenate([ka, kb], axis=1)               # (3T, 6)

    order = np.lexsort(key.T[::-1])
    key_s = key[order]
    tri_s = tri_idx[order]
    pa_s = pa[order]
    pb_s = pb[order]

    same = np.all(key_s[1:] == key_s[:-1], axis=1)
    # group runs of identical keys; count 1 = boundary, 2 = interior wedge,
    # >2 = non-manifold (dropped, as in the reference's 2-tri pairing)
    starts = np.concatenate([[0], np.nonzero(~same)[0] + 1])
    counts = np.diff(np.concatenate([starts, [len(key_s)]]))

    p0_list, p1_list, n1_list, n2_list = [], [], [], []
    t1_list, t2_list = [], []
    g2 = counts == 2
    g1 = counts == 1
    s2 = starts[g2]
    s1 = starts[g1]

    # interior edges (exactly two faces)
    if len(s2):
        tA = tri_s[s2]
        tB = tri_s[s2 + 1]
        p0_list.append(pa_s[s2])
        p1_list.append(pb_s[s2])
        n1_list.append(geo_n[tA])
        n2_list.append(geo_n[tB])
        t1_list.append(tA)
        t2_list.append(tB)
    # boundary edges
    if len(s1):
        tA = tri_s[s1]
        p0_list.append(pa_s[s1])
        p1_list.append(pb_s[s1])
        n1_list.append(geo_n[tA])
        n2_list.append(-geo_n[tA])
        t1_list.append(tA)
        t2_list.append(np.full(len(s1), -1, np.int64))

    if not p0_list:
        return _empty()
    p0 = np.concatenate(p0_list)
    p1 = np.concatenate(p1_list)
    n1 = np.concatenate(n1_list)
    n2 = np.concatenate(n2_list)
    tA = np.concatenate(t1_list)
    tB = np.concatenate(t2_list)

    d = p1 - p0
    length = np.linalg.norm(d, axis=-1)
    ok = length > 1e-12
    p0, p1, n1, n2, tA, tB, d, length = (
        a[ok] for a in (p0, p1, n1, n2, tA, tB, d, length))
    if len(p0) == 0:
        return _empty()
    e = d / length[:, None]
    m = 0.5 * (p0 + p1)
    cent = positions.mean(axis=1)
    interior = tB >= 0
    c1 = cent[tA]
    c2 = cent[np.where(interior, tB, tA)]

    # concave wedges: flip both normals outwards; inconsistent pairs drop
    # (reference edge_classification.hpp edge_for:44-57)
    concave1 = np.sum(n1 * (c2 - m), axis=-1) > 0
    concave2 = np.sum(n2 * (c1 - m), axis=-1) > 0
    inconsistent = interior & (concave1 != concave2)
    flip = interior & concave1 & concave2
    n1 = np.where(flip[:, None], -n1, n1)
    n2 = np.where(flip[:, None], -n2, n2)

    # face tangents ⊥ edge, pointing into each face (:58-66)
    t1v = np.cross(n1, e)
    t1v = np.where((np.sum(t1v * (c1 - m), axis=-1) < 0)[:, None],
                   -t1v, t1v)
    t2v = np.cross(n2, e)
    t2v = np.where((np.sum(t2v * (c2 - m), axis=-1) < 0)[:, None],
                   -t2v, t2v)
    t2v = np.where(interior[:, None], t2v, t1v)

    # wedge angle; drop near-planar interior wedges
    cosn = np.clip(np.sum(n1 * n2, axis=-1), -1.0, 1.0)
    face_angle = np.degrees(np.arccos(cosn))   # 0 = coplanar faces
    keep = (~interior | (face_angle > (180.0 - PLANAR_ANGLE_DEG))) \
        & ~inconsistent
    alpha = np.maximum(0.0, math.pi - np.arccos(cosn))

    (p0, p1, n1, n2, t1v, t2v, tA, tB, alpha, e, length) = (
        a[keep] for a in (p0, p1, n1, n2, t1v, t2v, tA, tB, alpha, e,
                          length))
    if len(p0) == 0:
        return _empty()
    return EdgeTable(
        p0=jnp.asarray(p0, jnp.float32), p1=jnp.asarray(p1, jnp.float32),
        e=jnp.asarray(e, jnp.float32),
        n1=jnp.asarray(n1, jnp.float32), n2=jnp.asarray(n2, jnp.float32),
        t1=jnp.asarray(t1v, jnp.float32), t2=jnp.asarray(t2v, jnp.float32),
        alpha=jnp.asarray(alpha, jnp.float32),
        length=jnp.asarray(length, jnp.float32),
        center=jnp.asarray(0.5 * (p0 + p1), jnp.float32),
        tri1=jnp.asarray(tA, jnp.int32), tri2=jnp.asarray(tB, jnp.int32))


@struct.dataclass
class EdgeClusters:
    """Two-level edge index: bounding-sphere clusters over grid cells.

    Device queries test the beam envelope against M cluster spheres (dense)
    and only then against the edges of the best few clusters — a
    fixed-shape stand-in for the reference's BVH ball/cone queries that
    scales past the brute-force edge budget."""
    center: jnp.ndarray    # (M, 3)
    radius: jnp.ndarray    # (M,)
    start: jnp.ndarray     # (M,) i32 into `order`
    count: jnp.ndarray     # (M,) i32
    order: jnp.ndarray     # (E,) i32 edge rows grouped by cluster

    @property
    def num_clusters(self):
        return self.center.shape[0]


def build_edge_clusters(edges: EdgeTable, grid: int | None = None
                        ) -> EdgeClusters:
    """Host: bucket edges by the grid cell of their centre; grid sized so
    clusters average ~32 edges."""
    E = edges.count
    if grid is None:
        grid = max(2, int(round((max(E, 1) / 32.0) ** (1.0 / 3.0))))
    if E == 0:
        return EdgeClusters(center=jnp.zeros((1, 3)), radius=jnp.zeros(1),
                            start=jnp.zeros(1, jnp.int32),
                            count=jnp.zeros(1, jnp.int32),
                            order=jnp.zeros(0, jnp.int32))
    c = np.asarray(edges.center)
    p0 = np.asarray(edges.p0)
    p1 = np.asarray(edges.p1)
    lo = c.min(axis=0)
    hi = c.max(axis=0)
    ext = np.maximum(hi - lo, 1e-9)
    cell = np.minimum((c - lo) / ext * grid, grid - 1e-4).astype(np.int64)
    key = (cell[:, 0] * grid + cell[:, 1]) * grid + cell[:, 2]
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    starts = np.concatenate([[0], np.nonzero(np.diff(key_s))[0] + 1])
    counts = np.diff(np.concatenate([starts, [E]]))
    M = len(starts)
    center = np.zeros((M, 3), np.float32)
    radius = np.zeros(M, np.float32)
    for m in range(M):
        ids = order[starts[m]: starts[m] + counts[m]]
        pts = np.concatenate([p0[ids], p1[ids]])
        ctr = pts.mean(axis=0)
        center[m] = ctr
        radius[m] = np.linalg.norm(pts - ctr, axis=1).max()
    return EdgeClusters(
        center=jnp.asarray(center), radius=jnp.asarray(radius),
        start=jnp.asarray(starts, jnp.int32),
        count=jnp.asarray(counts, jnp.int32),
        order=jnp.asarray(order, jnp.int32))


def edges_near_ray_clustered(edges: EdgeTable, clusters: EdgeClusters,
                             ro, rd, x0, tan_alpha, zmax, K: int,
                             n_clusters: int = 8,
                             edges_per_cluster: int = 64):
    """Clustered variant of edges_near_ray: intersect the swept envelope
    with cluster spheres, take the earliest few clusters, then exact
    segment tests on their (capped) edge lists. Returns (idx, z, count)."""
    N = ro.shape[0]
    if edges.count == 0:
        return (jnp.full((N, K), -1, jnp.int32),
                jnp.full((N, K), jnp.inf), jnp.zeros((N,), jnp.int32))
    M = clusters.num_clusters

    # sphere vs swept cone: distance from sphere centre to ray ≤
    # radius(z) + sphere radius at the closest-approach z
    w = clusters.center[None, :, :] - ro[:, None, :]        # (N, M, 3)
    zc = jnp.clip(jnp.sum(w * rd[:, None, :], axis=-1), 0.0, None)
    closest = ro[:, None, :] + zc[..., None] * rd[:, None, :]
    dist = jnp.linalg.norm(closest - clusters.center[None], axis=-1)
    reach = x0[:, None] + tan_alpha[:, None] * zc \
        + clusters.radius[None]
    okc = (dist <= reach) & (zc - clusters.radius[None] <= zmax[:, None])
    zk = jnp.where(okc, zc, jnp.inf)
    negz, sel = jax.lax.top_k(-zk, n_clusters)              # earliest few
    valid_cl = jnp.isfinite(-negz)                          # (N, n_cl)

    # candidate edge rows for all selected clusters, fully vectorized:
    # (N, n_clusters * edges_per_cluster)
    base = clusters.start[sel]                              # (N, n_cl)
    cnt = clusters.count[sel]
    offs = jnp.arange(edges_per_cluster, dtype=jnp.int32)
    cand = (base[..., None] + offs[None, None, :])
    in_range = (offs[None, None, :] < cnt[..., None]) \
        & valid_cl[..., None]
    cand = jnp.clip(cand, 0, clusters.order.shape[0] - 1)
    eidx = clusters.order[cand].reshape(N, -1)              # (N, J)
    in_range = in_range.reshape(N, -1)

    # exact segment-vs-swept-envelope tests, batched over J candidates
    p0 = edges.p0[eidx]                                     # (N, J, 3)
    ed = edges.p1[eidx] - p0
    ll = jnp.maximum(edges.length[eidx], 1e-12)
    w0 = ro[:, None, :] - p0
    b = jnp.sum(rd[:, None, :] * ed, axis=-1)
    c2 = ll * ll
    ddot = jnp.sum(rd[:, None, :] * w0, axis=-1)
    edot = jnp.sum(ed * w0, axis=-1)
    denom = c2 - b * b
    u = jnp.clip((b * -ddot + edot)
                 / jnp.where(denom < 1e-20, 1e-20, denom), 0.0, 1.0)
    z = jnp.maximum(-ddot + b * u, 0.0)
    u = jnp.clip((z * b + edot) / c2, 0.0, 1.0)
    q = p0 + u[..., None] * ed
    pr = ro[:, None, :] + z[..., None] * rd[:, None, :]
    d = jnp.linalg.norm(pr - q, axis=-1)
    rad = x0[:, None] + tan_alpha[:, None] * z
    ok = in_range & (d <= rad) & (z > 1e-7) & (z < zmax[:, None])
    zq = jnp.where(ok, z, jnp.inf)
    negk, selk = jax.lax.top_k(-zq, K)
    best_z = -negk
    best_i = jnp.take_along_axis(eidx, selk, axis=1)
    valid = jnp.isfinite(best_z)
    return (jnp.where(valid, best_i, -1), best_z,
            valid.sum(axis=1).astype(jnp.int32))


def _exact_cone_entries(ro, rd, env, p0, p1, zmax, zmin: float = 1e-7):
    """Exact elliptic cone–edge entry distances for candidate segments
    (reference intersect_cone_edge, cone.hpp:39-128). p0/p1 (N, J, 3);
    returns (z (N, J), ok (N, J))."""
    from wave_tracer_tpu.ops import cone_intersect as ci
    N, J = p0.shape[:2]
    xh = env.x
    yh = jnp.cross(rd, xh)
    ecc = env.e[:, None]

    def to_local(p):
        w = p - ro[:, None, :]
        return jnp.stack([
            jnp.sum(w * xh[:, None, :], axis=-1),
            ecc * jnp.sum(w * yh[:, None, :], axis=-1),
            jnp.sum(w * rd[:, None, :], axis=-1)], axis=-1)

    A = to_local(p0)
    B = to_local(p1)
    z, _, ok = ci.cone_edge_entry(
        env.x0[:, None], env.ta[:, None], A, B,
        jnp.full((N, J), zmin), jnp.broadcast_to(zmax[:, None], (N, J)))
    return z, ok


def edges_near_cone(edges: EdgeTable, ro, rd, env, zmax, K: int,
                    tile: int = 1024):
    """EXACT elliptic cone-mode edge set: entry-distance-ordered top-K
    (replaces the isotropic closest-approach approximation of
    edges_near_ray when the full envelope state is available)."""
    E = edges.count
    N = ro.shape[0]
    if E == 0:
        return (jnp.full((N, K), -1, jnp.int32),
                jnp.full((N, K), jnp.inf), jnp.zeros((N,), jnp.int32))
    EP = max(tile, ((E + tile - 1) // tile) * tile)
    pad = EP - E
    p0 = jnp.pad(edges.p0, ((0, pad), (0, 0)))
    p1 = jnp.pad(edges.p1, ((0, pad), (0, 0)))

    def body(ci_idx, carry):
        bz, bidx = carry
        s = ci_idx * tile
        tp0 = jax.lax.dynamic_slice(p0, (s, 0), (tile, 3))
        tp1 = jax.lax.dynamic_slice(p1, (s, 0), (tile, 3))
        z, ok = _exact_cone_entries(
            ro, rd, env, jnp.broadcast_to(tp0[None], (N, tile, 3)),
            jnp.broadcast_to(tp1[None], (N, tile, 3)), zmax)
        ids = s + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        zk = jnp.where(ok & (ids < E), z, jnp.inf)
        cat_z = jnp.concatenate([bz, zk], axis=1)
        cat_i = jnp.concatenate([bidx, jnp.broadcast_to(ids, zk.shape)],
                                axis=1)
        neg, sel = jax.lax.top_k(-cat_z, K)
        return -neg, jnp.take_along_axis(cat_i, sel, axis=1)

    init = (jnp.full((N, K), jnp.inf), jnp.full((N, K), -1, jnp.int32))
    bz, bidx = jax.lax.fori_loop(0, EP // tile, body, init)
    valid = jnp.isfinite(bz)
    return (jnp.where(valid, bidx, -1), bz,
            valid.sum(axis=1).astype(jnp.int32))


def edges_near_cone_clustered(edges: EdgeTable, clusters: EdgeClusters,
                              ro, rd, env, zmax, K: int,
                              n_clusters: int = 8,
                              edges_per_cluster: int = 64):
    """Clustered exact cone-mode edge set: conservative major-axis
    sphere prefilter (the isotropic bound encloses the elliptic
    envelope), then exact cone–edge entries on the candidates."""
    N = ro.shape[0]
    if edges.count == 0:
        return (jnp.full((N, K), -1, jnp.int32),
                jnp.full((N, K), jnp.inf), jnp.zeros((N,), jnp.int32))
    w = clusters.center[None, :, :] - ro[:, None, :]
    zc = jnp.clip(jnp.sum(w * rd[:, None, :], axis=-1), 0.0, None)
    closest = ro[:, None, :] + zc[..., None] * rd[:, None, :]
    dist = jnp.linalg.norm(closest - clusters.center[None], axis=-1)
    reach = env.x0[:, None] + env.ta[:, None] * zc \
        + clusters.radius[None]
    okc = (dist <= reach) & (zc - clusters.radius[None] <= zmax[:, None])
    zk = jnp.where(okc, zc, jnp.inf)
    negz, sel = jax.lax.top_k(-zk, n_clusters)
    valid_cl = jnp.isfinite(-negz)

    base = clusters.start[sel]
    cnt = clusters.count[sel]
    offs = jnp.arange(edges_per_cluster, dtype=jnp.int32)
    cand = (base[..., None] + offs[None, None, :])
    in_range = (offs[None, None, :] < cnt[..., None]) \
        & valid_cl[..., None]
    cand = jnp.clip(cand, 0, clusters.order.shape[0] - 1)
    eidx = clusters.order[cand].reshape(N, -1)
    in_range = in_range.reshape(N, -1)

    z, ok = _exact_cone_entries(ro, rd, env, edges.p0[eidx],
                                edges.p1[eidx], zmax)
    zq = jnp.where(ok & in_range, z, jnp.inf)
    negk, selk = jax.lax.top_k(-zq, K)
    best_z = -negk
    best_i = jnp.take_along_axis(eidx, selk, axis=1)
    valid = jnp.isfinite(best_z)
    return (jnp.where(valid, best_i, -1), best_z,
            valid.sum(axis=1).astype(jnp.int32))


def _lexless(a, b):
    """Lexicographic a < b over last axis (3 ints)."""
    lt = a[:, 0] < b[:, 0]
    eq0 = a[:, 0] == b[:, 0]
    lt1 = a[:, 1] < b[:, 1]
    eq1 = a[:, 1] == b[:, 1]
    lt2 = a[:, 2] < b[:, 2]
    return lt | (eq0 & (lt1 | (eq1 & lt2)))


def _empty() -> EdgeTable:
    z3 = jnp.zeros((0, 3), jnp.float32)
    z = jnp.zeros((0,), jnp.float32)
    zi = jnp.zeros((0,), jnp.int32)
    return EdgeTable(p0=z3, p1=z3, e=z3, n1=z3, n2=z3, t1=z3, t2=z3,
                     alpha=z, length=z, center=z3, tri1=zi, tri2=zi)


# ---------------------------------------------------------------------------
# device queries
# ---------------------------------------------------------------------------

def edges_in_ball(edges: EdgeTable, center, radius, K: int,
                  tile: int = 1024):
    """Top-K nearest edges whose segment intersects the ball
    (center (N,3), radius (N,)). Returns (idx (N,K) i32 with −1 padding,
    dist (N,K), count (N,)).

    Tiled brute-force over the edge table — dense VPU work instead of the
    reference's per-thread BVH ball queries (src/ads/bvh8w.cpp:610-736).
    """
    E = edges.count
    N = center.shape[0]
    if E == 0:
        return (jnp.full((N, K), -1, jnp.int32), jnp.full((N, K), jnp.inf),
                jnp.zeros((N,), jnp.int32))
    import jax

    EP = max(tile, ((E + tile - 1) // tile) * tile)
    pad = EP - E
    p0 = jnp.pad(edges.p0, ((0, pad), (0, 0)))
    d = jnp.pad(edges.p1 - edges.p0, ((0, pad), (0, 0)))
    ll = jnp.pad(edges.length, (0, pad))

    def seg_dist(c, s):
        """Distance from points c (N,3) to segment tile s.. (tile,)."""
        tp0 = jax.lax.dynamic_slice(p0, (s, 0), (tile, 3))
        td = jax.lax.dynamic_slice(d, (s, 0), (tile, 3))
        tl = jax.lax.dynamic_slice(ll, (s,), (tile,))
        w = c[:, None, :] - tp0[None]                  # (N, tile, 3)
        t_par = jnp.sum(w * td[None], axis=-1) \
            / jnp.maximum(tl * tl, 1e-30)[None]
        t_par = jnp.clip(t_par, 0.0, 1.0)
        q = tp0[None] + t_par[..., None] * td[None]
        return jnp.linalg.norm(c[:, None, :] - q, axis=-1)

    def body(ci, carry):
        bdist, bidx = carry
        s = ci * tile
        dist = seg_dist(center, s)
        ids = s + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        dist = jnp.where((ids < E) & (dist <= radius[:, None]), dist,
                         jnp.inf)
        # merge tile hits into running top-K (concat + top_k)
        cat_d = jnp.concatenate([bdist, dist], axis=1)
        cat_i = jnp.concatenate([bidx, jnp.broadcast_to(ids, dist.shape)],
                                axis=1)
        neg, sel = jax.lax.top_k(-cat_d, K)
        return -neg, jnp.take_along_axis(cat_i, sel, axis=1)

    init = (jnp.full((N, K), jnp.inf), jnp.full((N, K), -1, jnp.int32))
    bdist, bidx = jax.lax.fori_loop(0, EP // tile, body, init)
    valid = jnp.isfinite(bdist)
    bidx = jnp.where(valid, bidx, -1)
    return bidx, bdist, valid.sum(axis=1).astype(jnp.int32)


def edges_near_ray(edges: EdgeTable, ro, rd, x0, tan_alpha, zmax, K: int,
                   tile: int = 1024):
    """Edges inside the swept cone envelope of a ray segment.

    For each lane: edges whose segment comes within radius(z) = x0 +
    tanα·z of the ray at ray-parameter z ∈ (0, zmax). Returns
    (idx (N, K) −1-padded, z (N, K) ray parameter of closest approach,
    count (N,)), ordered by ascending z — the earliest encounter first.

    This is the ray-mode analogue of the reference's cone traversal edge
    accumulation (src/ads/bvh8w.cpp cone mode + plt_path ballistic edge
    search, plt_path_detail.hpp:657-660).
    """
    E = edges.count
    N = ro.shape[0]
    if E == 0:
        return (jnp.full((N, K), -1, jnp.int32),
                jnp.full((N, K), jnp.inf), jnp.zeros((N,), jnp.int32))
    import jax

    EP = max(tile, ((E + tile - 1) // tile) * tile)
    pad = EP - E
    p0 = jnp.pad(edges.p0, ((0, pad), (0, 0)))
    ed = jnp.pad(edges.p1 - edges.p0, ((0, pad), (0, 0)))
    el = jnp.pad(edges.length, (0, pad))

    def body(ci, carry):
        bz, bidx = carry
        s = ci * tile
        tp0 = jax.lax.dynamic_slice(p0, (s, 0), (tile, 3))
        td = jax.lax.dynamic_slice(ed, (s, 0), (tile, 3))
        tl = jax.lax.dynamic_slice(el, (s,), (tile,))
        # closest points between ray (ro, rd) and segments (tp0, td):
        # minimize |ro + z rd − tp0 − u td|², z ≥ 0, u ∈ [0, l²-normalized]
        w0 = ro[:, None, :] - tp0[None]               # (N, T, 3)
        a = 1.0                                        # rd·rd
        b = jnp.sum(rd[:, None, :] * td[None], axis=-1)
        c = jnp.maximum(tl * tl, 1e-30)[None]
        ddot = jnp.sum(rd[:, None, :] * w0, axis=-1)
        edot = jnp.sum(td[None] * w0, axis=-1)
        denom = a * c - b * b
        u = jnp.clip((b * -ddot + a * edot)
                     / jnp.where(denom < 1e-20, 1e-20, denom), 0.0, 1.0)
        z = jnp.maximum(-ddot + b * u, 0.0)
        # recompute u for the clamped z
        u = jnp.clip((z * b + edot) / c, 0.0, 1.0)
        q = tp0[None] + u[..., None] * td[None]
        pr = ro[:, None, :] + z[..., None] * rd[:, None, :]
        dist = jnp.linalg.norm(pr - q, axis=-1)
        radius = x0[:, None] + tan_alpha[:, None] * z
        ids = s + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        ok = (ids < E) & (dist <= radius) & (z > 1e-7) \
            & (z < zmax[:, None])
        zk = jnp.where(ok, z, jnp.inf)
        cat_z = jnp.concatenate([bz, zk], axis=1)
        cat_i = jnp.concatenate([bidx, jnp.broadcast_to(ids, zk.shape)],
                                axis=1)
        neg, sel = jax.lax.top_k(-cat_z, K)
        return -neg, jnp.take_along_axis(cat_i, sel, axis=1)

    init = (jnp.full((N, K), jnp.inf), jnp.full((N, K), -1, jnp.int32))
    bz, bidx = jax.lax.fori_loop(0, EP // tile, body, init)
    valid = jnp.isfinite(bz)
    bidx = jnp.where(valid, bidx, -1)
    return bidx, bz, valid.sum(axis=1).astype(jnp.int32)
