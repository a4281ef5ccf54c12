"""Wavefront ray tracing kernels over SoA scene geometry (jit-compiled).

Two backends, both operating on flat triangle arrays:

* ``brute``  — tiled all-triangles test. For the scene sizes of the wave
  benchmarks (tens to thousands of triangles) this maps far better onto the
  TPU VPU than gather-heavy tree traversal: each step is a dense
  (beam_tile x tri_tile) Moller-Trumbore evaluation with a running min-reduce.
* ``bvh``    — stack-based traversal of the flat binary BVH (accel/bvh.py)
  for large scenes; per-lane stacks live in a (N, MAX_DEPTH) array updated
  with scatters, all lanes step in lock-step.

The reference's equivalents are the 8-wide BVH traversals in
reference src/ads/bvh8w.cpp:469-554 (ray) — here the batch dimension replaces
the SIMD width.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from wave_tracer_tpu.accel import mxu_cone, mxu_trace
from wave_tracer_tpu.accel.bvh import MAX_DEPTH
from wave_tracer_tpu.ops.intersect import BIG, ray_aabb, ray_tri


@struct.dataclass
class GeoArrays:
    """Device-side scene geometry, triangles pre-permuted into BVH order.

    Hot-path data is PACKED into single wide rows so each BVH step /
    attribute fetch costs ONE gather: on this TPU backend a row gather has
    a large fixed cost (measured ~1 µs per gather op at 16k lanes,
    independent of width up to 32 f32 columns), so 11 narrow gathers run
    10× slower than one packed gather.
    """
    p0: jnp.ndarray      # (T, 3)
    e1: jnp.ndarray      # (T, 3)
    e2: jnp.ndarray      # (T, 3)
    n0: jnp.ndarray      # (T, 3) shading normals per corner
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray     # (T, 2)
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    geo_n: jnp.ndarray   # (T, 3)
    dpdu: jnp.ndarray    # (T, 3)
    mat_id: jnp.ndarray  # (T,) i32
    shape_id: jnp.ndarray  # (T,) i32
    emitter_id: jnp.ndarray  # (T,) i32; -1 when not an area emitter
    # flat BVH
    node_min: jnp.ndarray
    node_max: jnp.ndarray
    node_left: jnp.ndarray
    node_count: jnp.ndarray
    # packed hot rows
    tri_geom: jnp.ndarray   # (T, 12): p0, e1, e2, pad3
    tri_attr: jnp.ndarray   # (T, 32): n0 n1 n2 uv0 uv1 uv2 geo_n dpdu
                            #          mat shape emitter (ids as f32)
    node_pack: jnp.ndarray  # (M, 16): cnt, left, Lmin3, Lmax3, Rmin3,
                            #          Rmax3, pad2 (children AABBs inline)
    tri_mxu: jnp.ndarray    # (16, ntiles*4*BT) MXU intersector features
    mxu_center: jnp.ndarray  # (3,) translation applied to the features
    cone_feat: jnp.ndarray  # (16, ntiles*12*BT) MXU cone-sweep features
    #                         (accel/mxu_cone.py; local-coord bilinears)

    @property
    def num_tris(self):
        return self.p0.shape[0]


def from_soup(soup, mat_id, shape_id, emitter_id, bvh) -> GeoArrays:
    """Upload a TriangleSoup + per-tri ids, permuted into BVH leaf order."""
    import numpy as np
    perm = bvh.tri_order if len(bvh.tri_order) else np.zeros(0, np.int32)
    p = soup.positions[perm]
    n = soup.normals[perm]
    uv = soup.uvs[perm]
    T = len(perm)
    mat_p = np.asarray(mat_id)[perm].astype(np.float32)
    shape_p = np.asarray(shape_id)[perm].astype(np.float32)
    emit_p = np.asarray(emitter_id)[perm].astype(np.float32)
    e1 = (p[:, 1] - p[:, 0]).astype(np.float32)
    e2 = (p[:, 2] - p[:, 0]).astype(np.float32)
    tri_geom = np.zeros((T, 12), np.float32)
    tri_geom[:, 0:3] = p[:, 0]
    tri_geom[:, 3:6] = e1
    tri_geom[:, 6:9] = e2
    tri_attr = np.zeros((T, 32), np.float32)
    tri_attr[:, 0:3] = n[:, 0]
    tri_attr[:, 3:6] = n[:, 1]
    tri_attr[:, 6:9] = n[:, 2]
    tri_attr[:, 9:11] = uv[:, 0]
    tri_attr[:, 11:13] = uv[:, 1]
    tri_attr[:, 13:15] = uv[:, 2]
    tri_attr[:, 15:18] = soup.geo_n[perm]
    tri_attr[:, 18:21] = soup.dpdu[perm]
    tri_attr[:, 21] = mat_p
    tri_attr[:, 22] = shape_p
    tri_attr[:, 23] = emit_p

    mxu_center = (p.reshape(-1, 3).mean(axis=0).astype(np.float32)
                  if T else np.zeros(3, np.float32))

    nmin = np.asarray(bvh.node_min, np.float32)
    nmax = np.asarray(bvh.node_max, np.float32)
    nleft = np.asarray(bvh.node_left, np.int64)
    ncount = np.asarray(bvh.node_count, np.int64)
    M = len(nleft)
    node_pack = np.zeros((max(M, 1), 16), np.float32)
    if M:
        node_pack[:, 0] = ncount
        node_pack[:, 1] = nleft
        internal = ncount == 0
        li = np.where(internal, np.clip(nleft, 0, M - 1), 0)
        ri = np.where(internal, np.clip(nleft + 1, 0, M - 1), 0)
        node_pack[:, 2:5] = nmin[li]
        node_pack[:, 5:8] = nmax[li]
        node_pack[:, 8:11] = nmin[ri]
        node_pack[:, 11:14] = nmax[ri]

    return GeoArrays(
        p0=jnp.asarray(p[:, 0]), e1=jnp.asarray(e1),
        e2=jnp.asarray(e2),
        n0=jnp.asarray(n[:, 0]), n1=jnp.asarray(n[:, 1]),
        n2=jnp.asarray(n[:, 2]),
        uv0=jnp.asarray(uv[:, 0]), uv1=jnp.asarray(uv[:, 1]),
        uv2=jnp.asarray(uv[:, 2]),
        geo_n=jnp.asarray(soup.geo_n[perm]),
        dpdu=jnp.asarray(soup.dpdu[perm]),
        mat_id=jnp.asarray(np.asarray(mat_id)[perm], jnp.int32),
        shape_id=jnp.asarray(np.asarray(shape_id)[perm], jnp.int32),
        emitter_id=jnp.asarray(np.asarray(emitter_id)[perm], jnp.int32),
        node_min=jnp.asarray(bvh.node_min),
        node_max=jnp.asarray(bvh.node_max),
        node_left=jnp.asarray(bvh.node_left),
        node_count=jnp.asarray(bvh.node_count),
        tri_geom=jnp.asarray(tri_geom),
        tri_attr=jnp.asarray(tri_attr),
        node_pack=jnp.asarray(node_pack),
        tri_mxu=jnp.asarray(mxu_trace.build_tri_features(
            p[:, 0], e1, e2, mxu_center)),
        mxu_center=jnp.asarray(mxu_center, jnp.float32),
        cone_feat=jnp.asarray(mxu_cone.build_cone_tri_features(
            p[:, 0] if T else np.zeros((0, 3)), e1, e2)),
    )


# ---------------------------------------------------------------------------
# brute-force backend
# ---------------------------------------------------------------------------

_TRI_TILE = 512


def _pad_len(T):
    return max(_TRI_TILE, ((T + _TRI_TILE - 1) // _TRI_TILE) * _TRI_TILE)


def trace_brute(geo: GeoArrays, ro, rd, tmin, tmax, exclude_tri=None):
    """Closest hit over all triangles. ro/rd (N,3), tmin/tmax (N,).
    exclude_tri: (N,) i32 triangle to skip (self-intersection), or None.
    Returns (t, tri_idx, u, v); tri_idx == -1 when missed."""
    T = geo.num_tris
    TP = _pad_len(T)
    pad = TP - T
    p0 = jnp.pad(geo.p0, ((0, pad), (0, 0)))
    e1 = jnp.pad(geo.e1, ((0, pad), (0, 0)))
    e2 = jnp.pad(geo.e2, ((0, pad), (0, 0)))
    N = ro.shape[0]
    if exclude_tri is None:
        exclude_tri = jnp.full((N,), -1, jnp.int32)

    def body(c, carry):
        best_t, best_i, best_u, best_v = carry
        s = c * _TRI_TILE
        tp0 = jax.lax.dynamic_slice(p0, (s, 0), (_TRI_TILE, 3))
        te1 = jax.lax.dynamic_slice(e1, (s, 0), (_TRI_TILE, 3))
        te2 = jax.lax.dynamic_slice(e2, (s, 0), (_TRI_TILE, 3))
        t, u, v, hit = ray_tri(ro[:, None, :], rd[:, None, :],
                               tp0[None], te1[None], te2[None],
                               tmin[:, None], tmax[:, None])
        tri_ids = s + jax.lax.broadcasted_iota(jnp.int32, (1, _TRI_TILE), 1)
        hit &= tri_ids < T
        hit &= tri_ids != exclude_tri[:, None]
        t = jnp.where(hit, t, BIG)
        # closest within tile
        j = jnp.argmin(t, axis=1)
        rows = jnp.arange(N)
        tt = t[rows, j]
        better = tt < best_t
        return (jnp.where(better, tt, best_t),
                jnp.where(better, s + j, best_i),
                jnp.where(better, u[rows, j], best_u),
                jnp.where(better, v[rows, j], best_v))

    init = (jnp.full((N,), BIG), jnp.full((N,), -1, jnp.int32),
            jnp.zeros((N,)), jnp.zeros((N,)))
    best_t, best_i, best_u, best_v = jax.lax.fori_loop(
        0, TP // _TRI_TILE, body, init)
    best_i = jnp.where(best_t < BIG, best_i, -1)
    return best_t, best_i, best_u, best_v


def occluded_brute(geo: GeoArrays, ro, rd, tmin, tmax, exclude_tri=None,
                   exclude_tri2=None, exclude_tri3=None):
    """Any-hit within (tmin, tmax). Returns bool (N,)."""
    T = geo.num_tris
    TP = _pad_len(T)
    pad = TP - T
    p0 = jnp.pad(geo.p0, ((0, pad), (0, 0)))
    e1 = jnp.pad(geo.e1, ((0, pad), (0, 0)))
    e2 = jnp.pad(geo.e2, ((0, pad), (0, 0)))
    N = ro.shape[0]
    if exclude_tri is None:
        exclude_tri = jnp.full((N,), -1, jnp.int32)
    if exclude_tri2 is None:
        exclude_tri2 = jnp.full((N,), -1, jnp.int32)
    if exclude_tri3 is None:
        exclude_tri3 = jnp.full((N,), -1, jnp.int32)

    def body(c, occ):
        s = c * _TRI_TILE
        tp0 = jax.lax.dynamic_slice(p0, (s, 0), (_TRI_TILE, 3))
        te1 = jax.lax.dynamic_slice(e1, (s, 0), (_TRI_TILE, 3))
        te2 = jax.lax.dynamic_slice(e2, (s, 0), (_TRI_TILE, 3))
        _, _, _, hit = ray_tri(ro[:, None, :], rd[:, None, :],
                               tp0[None], te1[None], te2[None],
                               tmin[:, None], tmax[:, None])
        tri_ids = s + jax.lax.broadcasted_iota(jnp.int32, (1, _TRI_TILE), 1)
        hit &= tri_ids < T
        hit &= tri_ids != exclude_tri[:, None]
        hit &= tri_ids != exclude_tri2[:, None]
        hit &= tri_ids != exclude_tri3[:, None]
        return occ | jnp.any(hit, axis=1)

    return jax.lax.fori_loop(0, TP // _TRI_TILE, body,
                             jnp.zeros((N,), bool))


# ---------------------------------------------------------------------------
# BVH backend
# ---------------------------------------------------------------------------

_LEAF_TILE = 4  # must cover max_leaf of the builder


def trace_bvh(geo: GeoArrays, ro, rd, tmin, tmax, exclude_tri=None):
    """Stack-based closest-hit traversal, lanes in lock-step.

    One packed gather per step: each node row carries its children's
    AABBs inline (node_pack), and each leaf triangle is one 12-column
    row (tri_geom) — the gather count per step, not bytes, dominates on
    this backend."""
    N = ro.shape[0]
    if exclude_tri is None:
        exclude_tri = jnp.full((N,), -1, jnp.int32)
    inv_rd = 1.0 / jnp.where(jnp.abs(rd) < 1e-30,
                             jnp.where(rd < 0, -1e-30, 1e-30), rd)
    rows = jnp.arange(N)

    def cond(state):
        sp = state[0]
        return jnp.any(sp > 0)

    def step(state):
        sp, stack, best_t, best_i, best_u, best_v = state
        active = sp > 0
        spc = jnp.maximum(sp - 1, 0)
        node = stack[rows, spc]
        node = jnp.where(active, node, 0)
        sp = jnp.where(active, spc, sp)

        nrow = geo.node_pack[node]                       # (N, 16)
        cnt = nrow[:, 0].astype(jnp.int32)
        left = nrow[:, 1].astype(jnp.int32)
        is_leaf = (cnt > 0) & active
        is_int = (cnt == 0) & active

        # --- internal: test children AABBs, push hit children near-first
        right = left + 1
        lt, lhit = ray_aabb(ro, inv_rd, nrow[:, 2:5], nrow[:, 5:8],
                            tmin, best_t)
        rt, rhit = ray_aabb(ro, inv_rd, nrow[:, 8:11], nrow[:, 11:14],
                            tmin, best_t)
        lhit &= is_int
        rhit &= is_int
        # near child popped first -> push far first
        l_near = lt <= rt
        first = jnp.where(l_near, left, right)
        second = jnp.where(l_near, right, left)
        first_hit = jnp.where(l_near, lhit, rhit)
        second_hit = jnp.where(l_near, rhit, lhit)
        # push far (second) then near (first)
        stack = stack.at[rows, sp].set(
            jnp.where(second_hit, second, stack[rows, sp]))
        sp = sp + second_hit.astype(jnp.int32)
        stack = stack.at[rows, sp].set(
            jnp.where(first_hit, first, stack[rows, sp]))
        sp = sp + first_hit.astype(jnp.int32)

        # --- leaf: test up to _LEAF_TILE triangles
        for k in range(_LEAF_TILE):
            ti = left + k
            ok = is_leaf & (k < cnt) & (ti != exclude_tri)
            tiv = jnp.where(ok, ti, 0)
            trow = geo.tri_geom[tiv]                      # (N, 12)
            t, u, v, hit = ray_tri(ro, rd, trow[:, 0:3], trow[:, 3:6],
                                   trow[:, 6:9], tmin, best_t)
            hit &= ok
            better = hit & (t < best_t)
            best_t = jnp.where(better, t, best_t)
            best_i = jnp.where(better, tiv, best_i)
            best_u = jnp.where(better, u, best_u)
            best_v = jnp.where(better, v, best_v)

        return sp, stack, best_t, best_i, best_u, best_v

    stack = jnp.zeros((N, MAX_DEPTH + 2), jnp.int32)
    sp = jnp.ones((N,), jnp.int32)  # root pre-pushed (node 0)
    init = (sp, stack, jnp.minimum(tmax, BIG),
            jnp.full((N,), -1, jnp.int32), jnp.zeros((N,)), jnp.zeros((N,)))
    _, _, best_t, best_i, best_u, best_v = jax.lax.while_loop(
        cond, step, init)
    best_t = jnp.where(best_i >= 0, best_t, BIG)
    return best_t, best_i, best_u, best_v


# ---------------------------------------------------------------------------
# dispatch + hit attribute interpolation
# ---------------------------------------------------------------------------

# measured on TPU v5e (cornell-box, 16k lanes): lock-step BVH traversal
# overtakes the dense tiled test beyond a few thousand triangles
BRUTE_THRESHOLD = 2048

# the MXU all-pairs intersector (accel/mxu_trace.py) beats both VPU brute
# and lock-step BVH on TPU up to ~10^5 triangles (O(N*T) but at matmul
# constants); beyond that the tree wins
MXU_MAX_TRIS = 1 << 17

_backend_cache = {}


def platform_is_tpu() -> bool:
    """True on a real TPU-ish platform (independent of the
    WT_TRACE_BACKEND override — the cone VMEM kernel selects on this,
    so forcing the RAY backend to bvh/brute does not silently drop the
    cone kernel to the slow jnp reference path)."""
    if "tpu" not in _backend_cache:
        plat = jax.devices()[0].platform.lower()
        _backend_cache["tpu"] = plat not in ("cpu", "metal", "rocm")
    return _backend_cache["tpu"]


def _tpu_like() -> bool:
    """True when the default RAY backend runs Pallas TPU kernels."""
    import os
    override = os.environ.get("WT_TRACE_BACKEND", "auto")
    if override == "mxu":
        return True
    if override in ("bvh", "brute", "cpu"):
        return False
    return platform_is_tpu()


def trace(geo: GeoArrays, ro, rd, tmin, tmax, exclude_tri=None):
    T = geo.num_tris
    if T and T <= MXU_MAX_TRIS and _tpu_like():
        return mxu_trace.trace_mxu(geo, ro, rd, tmin, tmax, exclude_tri)
    if T <= BRUTE_THRESHOLD:
        return trace_brute(geo, ro, rd, tmin, tmax, exclude_tri)
    return trace_bvh(geo, ro, rd, tmin, tmax, exclude_tri)


def ray_tests_per_lane(geo: GeoArrays) -> float:
    """Ray–triangle pair tests ONE trace/occluded call issues per lane
    under the backend `trace()` actually selects (ads_stats.hpp:63
    analogue). All-pairs backends (MXU / VPU brute) test every triangle;
    the lock-step BVH's count is data-dependent and not statically known,
    so it reports 0 — device counters stay trustworthy rather than
    wrong-by-large-factors."""
    T = geo.num_tris
    if T and (T <= BRUTE_THRESHOLD
              or (T <= MXU_MAX_TRIS and _tpu_like())):
        return float(T)
    return 0.0


def occluded_bvh(geo: GeoArrays, ro, rd, tmin, tmax, exclude_tri=None,
                 exclude_tri2=None, exclude_tri3=None):
    """Any-hit BVH traversal: lanes stop traversing on the first hit
    (no closest-hit bookkeeping — shadow rays are ~2/3 of all casts)."""
    N = ro.shape[0]
    if exclude_tri is None:
        exclude_tri = jnp.full((N,), -1, jnp.int32)
    if exclude_tri2 is None:
        exclude_tri2 = jnp.full((N,), -1, jnp.int32)
    if exclude_tri3 is None:
        exclude_tri3 = jnp.full((N,), -1, jnp.int32)
    inv_rd = 1.0 / jnp.where(jnp.abs(rd) < 1e-30,
                             jnp.where(rd < 0, -1e-30, 1e-30), rd)
    rows = jnp.arange(N)

    def cond(state):
        sp, _, occ = state
        return jnp.any((sp > 0) & ~occ)

    def step(state):
        sp, stack, occ = state
        active = (sp > 0) & ~occ
        spc = jnp.maximum(sp - 1, 0)
        node = jnp.where(active, stack[rows, spc], 0)
        sp = jnp.where(active, spc, sp)

        nrow = geo.node_pack[node]                       # (N, 16)
        cnt = nrow[:, 0].astype(jnp.int32)
        left = nrow[:, 1].astype(jnp.int32)
        is_leaf = (cnt > 0) & active
        is_int = (cnt == 0) & active

        right = left + 1
        _, lhit = ray_aabb(ro, inv_rd, nrow[:, 2:5], nrow[:, 5:8],
                           tmin, tmax)
        _, rhit = ray_aabb(ro, inv_rd, nrow[:, 8:11], nrow[:, 11:14],
                           tmin, tmax)
        lhit &= is_int
        rhit &= is_int
        stack = stack.at[rows, sp].set(
            jnp.where(rhit, right, stack[rows, sp]))
        sp = sp + rhit.astype(jnp.int32)
        stack = stack.at[rows, sp].set(
            jnp.where(lhit, left, stack[rows, sp]))
        sp = sp + lhit.astype(jnp.int32)

        for k in range(_LEAF_TILE):
            ti = left + k
            ok = is_leaf & (k < cnt) & (ti != exclude_tri) \
                & (ti != exclude_tri2) & (ti != exclude_tri3)
            tiv = jnp.where(ok, ti, 0)
            trow = geo.tri_geom[tiv]
            _, _, _, hit = ray_tri(ro, rd, trow[:, 0:3], trow[:, 3:6],
                                   trow[:, 6:9], tmin, tmax)
            occ = occ | (hit & ok)
        return sp, stack, occ

    stack = jnp.zeros((N, MAX_DEPTH + 2), jnp.int32)
    sp = jnp.ones((N,), jnp.int32)
    _, _, occ = jax.lax.while_loop(
        cond, step, (sp, stack, jnp.zeros((N,), bool)))
    return occ


def occluded(geo: GeoArrays, ro, rd, tmin, tmax, exclude_tri=None,
             exclude_tri2=None, exclude_tri3=None):
    T = geo.num_tris
    if T and T <= MXU_MAX_TRIS and _tpu_like():
        return mxu_trace.occluded_mxu(geo, ro, rd, tmin, tmax,
                                      exclude_tri, exclude_tri2,
                                      exclude_tri3)
    if T <= BRUTE_THRESHOLD:
        return occluded_brute(geo, ro, rd, tmin, tmax, exclude_tri,
                              exclude_tri2, exclude_tri3)
    return occluded_bvh(geo, ro, rd, tmin, tmax, exclude_tri,
                        exclude_tri2, exclude_tri3)


# ---------------------------------------------------------------------------
# region queries (ball-mode): triangles inside an interaction footprint
# ---------------------------------------------------------------------------

def _point_tri_dist(p, a, e1, e2, gn):
    """Exact point-to-triangle distance, batched.

    p (N, 1, 3) query points vs triangle tiles a/e1/e2/gn (1, T, 3).
    Plane projection + barycentric inside test, else min over the three
    edge segments (the reference's ball queries use tri distance too,
    src/ads/bvh8w.cpp:610-736).
    """
    w = p - a
    dist_pl = jnp.sum(w * gn, axis=-1)
    q = w - dist_pl[..., None] * gn              # projection, local to a
    # barycentric of q in (e1, e2)
    d11 = jnp.sum(e1 * e1, axis=-1)
    d12 = jnp.sum(e1 * e2, axis=-1)
    d22 = jnp.sum(e2 * e2, axis=-1)
    q1 = jnp.sum(q * e1, axis=-1)
    q2 = jnp.sum(q * e2, axis=-1)
    det = jnp.maximum(d11 * d22 - d12 * d12, 1e-30)
    u = (d22 * q1 - d12 * q2) / det
    v = (d11 * q2 - d12 * q1) / det
    inside = (u >= 0) & (v >= 0) & (u + v <= 1)

    def seg_d(s0, sd):
        ww = p - s0
        ll = jnp.maximum(jnp.sum(sd * sd, axis=-1), 1e-30)
        t = jnp.clip(jnp.sum(ww * sd, axis=-1) / ll, 0.0, 1.0)
        r = ww - t[..., None] * sd
        return jnp.sqrt(jnp.sum(r * r, axis=-1))

    d_edges = jnp.minimum(jnp.minimum(seg_d(a, e1), seg_d(a, e2)),
                          seg_d(a + e1, e2 - e1))
    return jnp.where(inside, jnp.abs(dist_pl), d_edges)


def tris_in_ball(geo: GeoArrays, center, radius, K: int, tile: int = 512):
    """Top-K nearest triangles intersecting ball (center (N,3),
    radius (N,)). Returns (idx (N,K) i32, −1-padded, dist (N,K),
    count (N,)).

    Tiled brute-force over the triangle table (dense VPU work replacing
    the reference's per-thread BVH ball traversal,
    src/ads/bvh8w.cpp:610-736); used by the BDPT wavefront-power integral
    to find the geometry inside an interaction region.
    """
    T = geo.num_tris
    N = center.shape[0]
    if T == 0:
        return (jnp.full((N, K), -1, jnp.int32), jnp.full((N, K), jnp.inf),
                jnp.zeros((N,), jnp.int32))
    TP = max(tile, ((T + tile - 1) // tile) * tile)
    pad = TP - T
    p0 = jnp.pad(geo.p0, ((0, pad), (0, 0)))
    e1 = jnp.pad(geo.e1, ((0, pad), (0, 0)))
    e2 = jnp.pad(geo.e2, ((0, pad), (0, 0)))
    gn = jnp.pad(geo.geo_n, ((0, pad), (0, 0)))

    def body(ci, carry):
        bdist, bidx = carry
        s = ci * tile
        ta = jax.lax.dynamic_slice(p0, (s, 0), (tile, 3))
        t1 = jax.lax.dynamic_slice(e1, (s, 0), (tile, 3))
        t2 = jax.lax.dynamic_slice(e2, (s, 0), (tile, 3))
        tn = jax.lax.dynamic_slice(gn, (s, 0), (tile, 3))
        dist = _point_tri_dist(center[:, None, :], ta[None], t1[None],
                               t2[None], tn[None])
        ids = s + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        dist = jnp.where((ids < T) & (dist <= radius[:, None]), dist,
                         jnp.inf)
        cat_d = jnp.concatenate([bdist, dist], axis=1)
        cat_i = jnp.concatenate([bidx, jnp.broadcast_to(ids, dist.shape)],
                                axis=1)
        neg, sel = jax.lax.top_k(-cat_d, K)
        return -neg, jnp.take_along_axis(cat_i, sel, axis=1)

    init = (jnp.full((N, K), jnp.inf), jnp.full((N, K), -1, jnp.int32))
    bdist, bidx = jax.lax.fori_loop(0, TP // tile, body, init)
    valid = jnp.isfinite(bdist)
    bidx = jnp.where(valid, bidx, -1)
    return bidx, bdist, valid.sum(axis=1).astype(jnp.int32)


def tris_near_ray(geo: GeoArrays, ro, rd, x0, tan_alpha, zmax, K: int,
                  tile: int = 512):
    """Thin circular-cone wrapper over the EXACT elliptic sweep
    tris_near_cone (eccentricity 1): kept for the isotropic-envelope
    call sites and tests; the duplicate segment-distance sweep it used
    to carry is gone (reference ads_t::intersect(cone),
    src/ads/bvh8w.cpp:233-318)."""
    from wave_tracer_tpu.wave.envelope import EnvState
    N = ro.shape[0]
    ax = jnp.cross(rd, jnp.asarray([0.0, 0.709, 0.705]))
    ln = jnp.linalg.norm(ax, axis=-1, keepdims=True)
    alt = jnp.cross(rd, jnp.asarray([1.0, 0.0, 0.0]))
    ax = jnp.where(ln < 1e-6, alt, ax)
    ax = ax / jnp.maximum(jnp.linalg.norm(ax, axis=-1, keepdims=True),
                          1e-12)
    env = EnvState(x=ax, x0=jnp.broadcast_to(x0, (N,)),
                   ta=jnp.broadcast_to(tan_alpha, (N,)),
                   e=jnp.ones((N,)))
    return tris_near_cone(geo, ro, rd, env, zmax, K, tile=tile)


def tris_near_cone(geo: GeoArrays, ro, rd, env, zmax, K: int,
                   tile: int = 512, zmin: float = 1e-7,
                   exclude_tri=None):
    """Triangle set intersecting the elliptic cone envelope — EXACT
    cone-mode intersect (reference ads_t::intersect(cone),
    src/ads/bvh8w.cpp:233-318 with the exact per-triangle test of
    include/wt/math/intersect/cone.hpp:550-627).

    env: wave.envelope.EnvState (x major dir, x0, ta, e) per lane; the
    cone rides (ro, rd). Returns (idx (N, K) i32 −1-padded, z (N, K)
    entry distances ascending, count (N,)).
    """
    from wave_tracer_tpu.ops import cone_intersect as ci
    T = geo.num_tris
    N = ro.shape[0]
    if T == 0:
        return (jnp.full((N, K), -1, jnp.int32),
                jnp.full((N, K), jnp.inf), jnp.zeros((N,), jnp.int32))
    if exclude_tri is None:
        exclude_tri = jnp.full((N,), -1, jnp.int32)
    TP = max(tile, ((T + tile - 1) // tile) * tile)
    pad = TP - T
    p0 = jnp.pad(geo.p0, ((0, pad), (0, 0)))
    e1 = jnp.pad(geo.e1, ((0, pad), (0, 0)))
    e2 = jnp.pad(geo.e2, ((0, pad), (0, 0)))

    xh = env.x
    yh = jnp.cross(rd, xh)
    ecc = env.e[:, None]

    def to_local(p):
        """(N, tile, 3) world → local scaled."""
        u = p - ro[:, None, :]
        return jnp.stack([
            jnp.sum(u * xh[:, None, :], axis=-1),
            ecc * jnp.sum(u * yh[:, None, :], axis=-1),
            jnp.sum(u * rd[:, None, :], axis=-1)], axis=-1)

    x0b = env.x0[:, None]
    tab = env.ta[:, None]
    zmaxb = jnp.broadcast_to(zmax[:, None], (N, tile))
    zminb = jnp.full((N, tile), zmin)

    def body(ci_idx, carry):
        bz, bidx = carry
        s = ci_idx * tile
        ta_ = jax.lax.dynamic_slice(p0, (s, 0), (tile, 3))
        t1 = jax.lax.dynamic_slice(e1, (s, 0), (tile, 3))
        t2 = jax.lax.dynamic_slice(e2, (s, 0), (tile, 3))
        A = to_local(jnp.broadcast_to(ta_[None], (N, tile, 3)))
        B = to_local(jnp.broadcast_to((ta_ + t1)[None], (N, tile, 3)))
        C = to_local(jnp.broadcast_to((ta_ + t2)[None], (N, tile, 3)))
        z, _, ok = ci.intersect_cone_tri(x0b, tab, A, B, C, zminb, zmaxb)
        ids = s + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        ok = ok & (ids < T) & (ids != exclude_tri[:, None])
        zk = jnp.where(ok, z, jnp.inf)
        cat_z = jnp.concatenate([bz, zk], axis=1)
        cat_i = jnp.concatenate([bidx, jnp.broadcast_to(ids, zk.shape)],
                                axis=1)
        neg, sel = jax.lax.top_k(-cat_z, K)
        return -neg, jnp.take_along_axis(cat_i, sel, axis=1)

    init = (jnp.full((N, K), jnp.inf), jnp.full((N, K), -1, jnp.int32))
    bz, bidx = jax.lax.fori_loop(0, TP // tile, body, init)
    valid = jnp.isfinite(bz)
    bidx = jnp.where(valid, bidx, -1)
    return bidx, bz, valid.sum(axis=1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# two-level clustered triangle-set queries (sublinear cone/ball sweeps)
# ---------------------------------------------------------------------------

# Above this triangle count the integrators switch the cone/ball SET
# queries from the tiled brute sweep to the clustered two-level index.
# Platform-dependent (measured): on CPU the clustered query wins 7x at
# 37k tris (609 vs 4441 ms, 4k lanes); on the axon v5e the per-lane
# candidate GATHERS dominate and the dense brute sweep wins at every
# benchmarked size (11k tris: 9.9k vs 7.9k beams/s; 93k tris: 1634 vs
# 331) — so the clustered path is off on TPU unless forced via
# WT_TRI_CLUSTER_MIN.
import functools as _functools
import os as _os

# query shape knobs (swept on hardware; see PARITY round-4)
TRI_N_CLUSTERS = int(_os.environ.get("WT_TRI_NCL", 12))
TRI_CAP = int(_os.environ.get("WT_TRI_CAP", 64))


@_functools.lru_cache(maxsize=1)
def tri_cluster_min() -> int:
    env = _os.environ.get("WT_TRI_CLUSTER_MIN")
    if env:
        return int(env)
    if jax.devices()[0].platform.lower() == "cpu":
        return 16384
    return 1 << 30


@struct.dataclass
class TriClusters:
    """Bounding-sphere clusters over grid cells of triangle centroids —
    the triangle counterpart of accel.edges.EdgeClusters. Device queries
    test the beam envelope against the M cluster spheres (tiled dense
    sweep), then run the EXACT cone/ball test only on the candidate
    lists of the best few clusters. This replaces the reference's BVH
    cone walk with its enlarged-AABB cluster pretest
    (reference src/ads/bvh8w.cpp:233-318 cone, :610-736 ball) with a
    TPU-shaped two-level scheme: O(M) dense + O(n_cl·cap) gathered exact
    tests instead of O(T) exact tests per lane per bounce."""
    center: jnp.ndarray    # (M, 3)
    radius: jnp.ndarray    # (M,)
    start: jnp.ndarray     # (M,) i32 into `order`
    count: jnp.ndarray     # (M,) i32
    order: jnp.ndarray     # (T,) i32 triangle rows grouped by cluster

    @property
    def num_clusters(self):
        return self.center.shape[0]


def build_tri_clusters(p0, e1, e2, grid: int | None = None,
                       target: int = 32, cap: int = 64) -> TriClusters:
    """Host (numpy): bucket triangles by the grid cell of their centroid;
    cluster spheres cover all three vertices.

    The grid is sized adaptively: surface meshes occupy only a shell of
    a volumetric grid, so the naive cbrt(T/target) sizing overpacks the
    occupied cells. We grow the grid until the mean occupied-cell count
    is ≲ target, then SPLIT any remaining cluster larger than `cap` into
    ≤cap chunks — queries with tris_per_cluster ≥ cap therefore see
    exact cluster membership (no truncation)."""
    import numpy as np
    p0 = np.asarray(p0, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    T = len(p0)
    if T == 0:
        return TriClusters(center=jnp.zeros((1, 3)), radius=jnp.zeros(1),
                           start=jnp.zeros(1, jnp.int32),
                           count=jnp.zeros(1, jnp.int32),
                           order=jnp.zeros(0, jnp.int32))
    c = p0 + (e1 + e2) / 3.0
    lo = c.min(axis=0)
    ext = np.maximum(c.max(axis=0) - lo, 1e-9)
    if grid is None:
        grid = max(2, int(round((max(T, 1) / float(target))
                                ** (1.0 / 3.0))))
        for _ in range(6):
            cell = np.minimum((c - lo) / ext * grid,
                              grid - 1e-4).astype(np.int64)
            key = (cell[:, 0] * grid + cell[:, 1]) * grid + cell[:, 2]
            occupied = len(np.unique(key))
            if T / max(occupied, 1) <= target or grid >= 128:
                break
            grid = int(grid * 1.5) + 1
    cell = np.minimum((c - lo) / ext * grid, grid - 1e-4).astype(np.int64)
    key = (cell[:, 0] * grid + cell[:, 1]) * grid + cell[:, 2]
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    cell_starts = np.concatenate([[0], np.nonzero(np.diff(key_s))[0] + 1])
    cell_counts = np.diff(np.concatenate([cell_starts, [T]]))
    # split cells larger than cap into ≤cap chunks
    starts, counts = [], []
    for s, n in zip(cell_starts, cell_counts):
        for off in range(0, n, cap):
            starts.append(s + off)
            counts.append(min(cap, n - off))
    starts = np.asarray(starts, np.int64)
    counts = np.asarray(counts, np.int64)
    M = len(starts)
    center = np.zeros((M, 3), np.float32)
    radius = np.zeros(M, np.float32)
    A, B, C = p0, p0 + e1, p0 + e2
    for m in range(M):
        ids = order[starts[m]: starts[m] + counts[m]]
        pts = np.concatenate([A[ids], B[ids], C[ids]])
        ctr = 0.5 * (pts.min(axis=0) + pts.max(axis=0))
        center[m] = ctr
        radius[m] = np.sqrt(((pts - ctr) ** 2).sum(axis=1).max())
    return TriClusters(
        center=jnp.asarray(center), radius=jnp.asarray(radius),
        start=jnp.asarray(starts, jnp.int32),
        count=jnp.asarray(counts, jnp.int32),
        order=jnp.asarray(order, jnp.int32))


def _clusters_near_cone(clusters: TriClusters, ro, rd, x0, ta, zmax,
                        n_clusters: int, tile: int = 512):
    """Earliest clusters whose spheres touch the swept envelope
    r(z) = x0 + ta·z. Tiled over the cluster table. Returns
    (sel (N, n_cl) i32, valid (N, n_cl))."""
    M = clusters.num_clusters
    N = ro.shape[0]
    MP = max(tile, ((M + tile - 1) // tile) * tile)
    cpad = jnp.pad(clusters.center, ((0, MP - M), (0, 0)),
                   constant_values=1e30)
    rpad = jnp.pad(clusters.radius, ((0, MP - M),))

    def body(ci, carry):
        bz, bidx = carry
        s = ci * tile
        cc = jax.lax.dynamic_slice(cpad, (s, 0), (tile, 3))
        cr = jax.lax.dynamic_slice(rpad, (s,), (tile,))
        w = cc[None, :, :] - ro[:, None, :]
        zc = jnp.clip(jnp.sum(w * rd[:, None, :], axis=-1), 0.0, None)
        closest = ro[:, None, :] + zc[..., None] * rd[:, None, :]
        dist = jnp.linalg.norm(closest - cc[None], axis=-1)
        reach = x0[:, None] + ta[:, None] * zc + cr[None]
        ids = s + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        ok = (ids < M) & (dist <= reach) \
            & (zc - cr[None] <= zmax[:, None])
        # order by the conservative EARLIEST possible entry z (a cluster
        # whose centre projects later can still hold the nearest tris)
        zk = jnp.where(ok, jnp.maximum(zc - cr[None], 0.0), jnp.inf)
        cat_z = jnp.concatenate([bz, zk], axis=1)
        cat_i = jnp.concatenate(
            [bidx, jnp.broadcast_to(ids, zk.shape)], axis=1)
        neg, sel = jax.lax.top_k(-cat_z, n_clusters)
        return -neg, jnp.take_along_axis(cat_i, sel, axis=1)

    init = (jnp.full((N, n_clusters), jnp.inf),
            jnp.full((N, n_clusters), 0, jnp.int32))
    bz, bidx = jax.lax.fori_loop(0, MP // tile, body, init)
    return bidx, jnp.isfinite(bz)


def _cluster_candidates(clusters: TriClusters, sel, valid_cl, cap: int):
    """Expand selected clusters into a (N, n_cl*cap) candidate row list
    (+in_range mask). Clusters longer than `cap` are truncated (the
    grid targets ~32 tris/cluster; cap=64 covers the tail)."""
    N = sel.shape[0]
    base = clusters.start[sel]                       # (N, n_cl)
    cnt = clusters.count[sel]
    offs = jnp.arange(cap, dtype=jnp.int32)
    cand = base[..., None] + offs[None, None, :]
    in_range = (offs[None, None, :] < cnt[..., None]) \
        & valid_cl[..., None]
    cand = jnp.clip(cand, 0, clusters.order.shape[0] - 1)
    tidx = clusters.order[cand].reshape(N, -1)
    return tidx, in_range.reshape(N, -1)


def tris_near_cone_clustered(geo: GeoArrays, clusters: TriClusters,
                             ro, rd, env, zmax, K: int,
                             n_clusters: int | None = None,
                             tris_per_cluster: int | None = None,
                             zmin: float = 1e-7, exclude_tri=None):
    """Clustered variant of tris_near_cone: envelope-vs-cluster-sphere
    sweep, then EXACT elliptic cone–triangle entry tests on the best
    clusters' candidate lists only. Same return contract
    (idx (N,K) −1-padded, z ascending, count)."""
    from wave_tracer_tpu.ops import cone_intersect as ci
    N = ro.shape[0]
    if geo.num_tris == 0:
        return (jnp.full((N, K), -1, jnp.int32),
                jnp.full((N, K), jnp.inf), jnp.zeros((N,), jnp.int32))
    if exclude_tri is None:
        exclude_tri = jnp.full((N,), -1, jnp.int32)
    n_clusters = n_clusters or TRI_N_CLUSTERS
    tris_per_cluster = tris_per_cluster or TRI_CAP
    sel, valid_cl = _clusters_near_cone(clusters, ro, rd, env.x0, env.ta,
                                        zmax, n_clusters)
    tidx, in_range = _cluster_candidates(clusters, sel, valid_cl,
                                         tris_per_cluster)
    J = tidx.shape[1]

    row = geo.tri_geom[tidx]                         # ONE packed gather
    xh = env.x
    yh = jnp.cross(rd, xh)
    ecc = env.e[:, None]

    def to_local(p):
        u = p - ro[:, None, :]
        return jnp.stack([
            jnp.sum(u * xh[:, None, :], axis=-1),
            ecc * jnp.sum(u * yh[:, None, :], axis=-1),
            jnp.sum(u * rd[:, None, :], axis=-1)], axis=-1)

    A = to_local(row[..., 0:3])
    B = to_local(row[..., 0:3] + row[..., 3:6])
    C = to_local(row[..., 0:3] + row[..., 6:9])
    z, _, ok = ci.intersect_cone_tri(
        env.x0[:, None], env.ta[:, None], A, B, C,
        jnp.full((N, J), zmin), jnp.broadcast_to(zmax[:, None], (N, J)))
    ok = ok & in_range & (tidx != exclude_tri[:, None])
    # a triangle can appear in one cluster only (grouped by centroid
    # cell), so no dedup is needed
    zk = jnp.where(ok, z, jnp.inf)
    neg, selk = jax.lax.top_k(-zk, K)
    bz = -neg
    bidx = jnp.take_along_axis(tidx, selk, axis=1)
    valid = jnp.isfinite(bz)
    return (jnp.where(valid, bidx, -1), bz,
            valid.sum(axis=1).astype(jnp.int32))


def tris_in_ball_clustered(geo: GeoArrays, clusters: TriClusters,
                           center, radius, K: int,
                           n_clusters: int | None = None,
                           tris_per_cluster: int | None = None):
    """Clustered variant of tris_in_ball: ball-vs-cluster-sphere sweep,
    then exact point–triangle distances on the candidates. Same return
    contract (idx, dist, count), nearest-first. APPROXIMATE under dense
    cluster overlap: only the n_clusters conservatively-nearest clusters
    are expanded (tests assert ≥98% recall vs the brute sweep)."""
    N = center.shape[0]
    if geo.num_tris == 0:
        return (jnp.full((N, K), -1, jnp.int32),
                jnp.full((N, K), jnp.inf), jnp.zeros((N,), jnp.int32))
    n_clusters = n_clusters or TRI_N_CLUSTERS
    tris_per_cluster = tris_per_cluster or TRI_CAP
    M = clusters.num_clusters
    tile = 512
    MP = max(tile, ((M + tile - 1) // tile) * tile)
    cpad = jnp.pad(clusters.center, ((0, MP - M), (0, 0)),
                   constant_values=1e30)
    rpad = jnp.pad(clusters.radius, ((0, MP - M),))

    def body(ci_, carry):
        bd, bidx = carry
        s = ci_ * tile
        cc = jax.lax.dynamic_slice(cpad, (s, 0), (tile, 3))
        cr = jax.lax.dynamic_slice(rpad, (s,), (tile,))
        d = jnp.linalg.norm(cc[None] - center[:, None, :], axis=-1)
        ids = s + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        ok = (ids < M) & (d <= radius[:, None] + cr[None])
        # rank by the conservative NEAREST possible triangle distance
        # max(d - cr, 0) (like the cone variant's earliest-entry key):
        # a big cluster whose centre is far can still hold the closest
        # triangle. The n_clusters truncation remains approximate under
        # extreme overlap (tests require 98% recall).
        dk = jnp.where(ok, jnp.maximum(d - cr[None], 0.0), jnp.inf)
        cat_d = jnp.concatenate([bd, dk], axis=1)
        cat_i = jnp.concatenate(
            [bidx, jnp.broadcast_to(ids, dk.shape)], axis=1)
        neg, sel = jax.lax.top_k(-cat_d, n_clusters)
        return -neg, jnp.take_along_axis(cat_i, sel, axis=1)

    init = (jnp.full((N, n_clusters), jnp.inf),
            jnp.full((N, n_clusters), 0, jnp.int32))
    bd, selc = jax.lax.fori_loop(0, MP // tile, body, init)
    tidx, in_range = _cluster_candidates(clusters, selc,
                                         jnp.isfinite(bd),
                                         tris_per_cluster)
    row = geo.tri_geom[tidx]                         # ONE packed gather
    a = row[..., 0:3]
    t1 = row[..., 3:6]
    t2 = row[..., 6:9]
    gn = jnp.cross(t1, t2)
    gn = gn / jnp.maximum(
        jnp.linalg.norm(gn, axis=-1, keepdims=True), 1e-30)
    dist = _point_tri_dist(center[:, None, :], a, t1, t2, gn)
    ok = in_range & (dist <= radius[:, None])
    dk = jnp.where(ok, dist, jnp.inf)
    neg, selk = jax.lax.top_k(-dk, K)
    bdist = -neg
    bidx = jnp.take_along_axis(tidx, selk, axis=1)
    valid = jnp.isfinite(bdist)
    return (jnp.where(valid, bidx, -1), bdist,
            valid.sum(axis=1).astype(jnp.int32))


def cone_boundary_minz(geo: GeoArrays, ro, rd, env, bounds, zmax,
                       tile: int = 512, zmin: float = 1e-7,
                       exclude_tri=None):
    """Earliest exact cone–triangle entry ≥ each schedule boundary.

    The hybrid traversal schedule (integrator/traversal.py) consumes the
    triangle sweep ONLY as min{z : z ≥ d_j} for its 16 fixed segment
    boundaries d_j — the top-K selection the general sweep performs is a
    per-tile SORT and dominated the wave bounce on the v5e (measured:
    replacing it with these masked min-reductions is the difference
    between 424 ms and ~this kernel's traversal floor). Returns
    (zc (N, B) per-boundary minima (inf = none ahead), cnt (N,) exact
    encounter count — feeds the tris-per-cone histogram uncapped).
    """
    from wave_tracer_tpu.ops import cone_intersect as ci
    T = geo.num_tris
    N = ro.shape[0]
    B = bounds.shape[1]
    if T == 0:
        return (jnp.full((N, B), jnp.inf), jnp.zeros((N,), jnp.int32))
    if exclude_tri is None:
        exclude_tri = jnp.full((N,), -1, jnp.int32)
    TP = max(tile, ((T + tile - 1) // tile) * tile)
    pad = TP - T
    p0 = jnp.pad(geo.p0, ((0, pad), (0, 0)))
    e1 = jnp.pad(geo.e1, ((0, pad), (0, 0)))
    e2 = jnp.pad(geo.e2, ((0, pad), (0, 0)))

    xh = env.x
    yh = jnp.cross(rd, xh)
    ecc = env.e[:, None]

    def to_local(p):
        u = p - ro[:, None, :]
        return jnp.stack([
            jnp.sum(u * xh[:, None, :], axis=-1),
            ecc * jnp.sum(u * yh[:, None, :], axis=-1),
            jnp.sum(u * rd[:, None, :], axis=-1)], axis=-1)

    zmaxb = jnp.broadcast_to(zmax[:, None], (N, tile))
    zminb = jnp.full((N, tile), zmin)

    def body(ci_idx, carry):
        zc, cnt = carry
        s = ci_idx * tile
        ta_ = jax.lax.dynamic_slice(p0, (s, 0), (tile, 3))
        t1 = jax.lax.dynamic_slice(e1, (s, 0), (tile, 3))
        t2 = jax.lax.dynamic_slice(e2, (s, 0), (tile, 3))
        A = to_local(jnp.broadcast_to(ta_[None], (N, tile, 3)))
        Bv = to_local(jnp.broadcast_to((ta_ + t1)[None], (N, tile, 3)))
        C = to_local(jnp.broadcast_to((ta_ + t2)[None], (N, tile, 3)))
        z, _, ok = ci.intersect_cone_tri(env.x0[:, None], env.ta[:, None],
                                         A, Bv, C, zminb, zmaxb)
        ids = s + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        ok = ok & (ids < T) & (ids != exclude_tri[:, None])
        zk = jnp.where(ok, z, jnp.inf)
        cnt = cnt + ok.sum(axis=1, dtype=jnp.int32)
        # per-boundary masked min (cheap VPU reduce, no sort)
        for j in range(B):
            zj = jnp.min(jnp.where(zk >= bounds[:, j:j + 1], zk, jnp.inf),
                         axis=1)
            zc = zc.at[:, j].set(jnp.minimum(zc[:, j], zj))
        return zc, cnt

    init = (jnp.full((N, B), jnp.inf), jnp.zeros((N,), jnp.int32))
    zc, cnt = jax.lax.fori_loop(0, TP // tile, body, init)
    return zc, cnt


def tris_near_cone_2pass(geo: GeoArrays, ro, rd, env, zmax, K: int,
                         J: int = 32, tile: int = 512,
                         zmin: float = 1e-7, exclude_tri=None):
    """Two-pass exact cone sweep: a ~20-flop bounding-sphere pretest
    over ALL triangles keeps the earliest J candidates per lane, then
    the EXACT elliptic cone–triangle entry test runs on those J only
    (one small gather). This is the per-triangle-granular cousin of the
    clustered query — same contract as tris_near_cone; the reference's
    enlarged-AABB cluster test before the exact per-tri test
    (src/ads/bvh8w.cpp:187-230) plays the same role. Approximate only
    through the J-candidate cap (J ≫ K; recall validated vs the brute
    oracle in tests/test_trace.py)."""
    from wave_tracer_tpu.ops import cone_intersect as ci
    T = geo.num_tris
    N = ro.shape[0]
    if T == 0:
        return (jnp.full((N, K), -1, jnp.int32),
                jnp.full((N, K), jnp.inf), jnp.zeros((N,), jnp.int32))
    if exclude_tri is None:
        exclude_tri = jnp.full((N,), -1, jnp.int32)
    TP = max(tile, ((T + tile - 1) // tile) * tile)
    pad = TP - T
    p0 = jnp.pad(geo.p0, ((0, pad), (0, 0)), constant_values=1e30)
    e1 = jnp.pad(geo.e1, ((0, pad), (0, 0)))
    e2 = jnp.pad(geo.e2, ((0, pad), (0, 0)))

    def bound_body(ci_idx, carry):
        bz, bidx = carry
        s = ci_idx * tile
        ta_ = jax.lax.dynamic_slice(p0, (s, 0), (tile, 3))
        t1 = jax.lax.dynamic_slice(e1, (s, 0), (tile, 3))
        t2 = jax.lax.dynamic_slice(e2, (s, 0), (tile, 3))
        # per-tile bounding spheres (shared across lanes, tiny)
        cen = ta_ + (t1 + t2) / 3.0
        r1 = jnp.sum((ta_ - cen) ** 2, axis=-1)
        r2_ = jnp.sum((ta_ + t1 - cen) ** 2, axis=-1)
        r3 = jnp.sum((ta_ + t2 - cen) ** 2, axis=-1)
        rad = jnp.sqrt(jnp.maximum(jnp.maximum(r1, r2_), r3))
        w = cen[None, :, :] - ro[:, None, :]
        zc = jnp.clip(jnp.sum(w * rd[:, None, :], axis=-1), 0.0, None)
        d2 = jnp.sum(w * w, axis=-1) - zc * zc
        reach = env.x0[:, None] + env.ta[:, None] * zc + rad[None]
        ids = s + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        ok = (ids < T) & (d2 <= reach * reach) \
            & (zc - rad[None] <= zmax[:, None]) \
            & (zc + rad[None] > zmin) \
            & (ids != exclude_tri[:, None])
        zk = jnp.where(ok, jnp.maximum(zc - rad[None], 0.0), jnp.inf)
        cat_z = jnp.concatenate([bz, zk], axis=1)
        cat_i = jnp.concatenate(
            [bidx, jnp.broadcast_to(ids, zk.shape)], axis=1)
        neg, sel = jax.lax.top_k(-cat_z, J)
        return -neg, jnp.take_along_axis(cat_i, sel, axis=1)

    init = (jnp.full((N, J), jnp.inf), jnp.full((N, J), 0, jnp.int32))
    bz, cand = jax.lax.fori_loop(0, TP // tile, bound_body, init)
    in_range = jnp.isfinite(bz)

    row = geo.tri_geom[cand]                         # ONE packed gather
    xh = env.x
    yh = jnp.cross(rd, xh)
    ecc = env.e[:, None]

    def to_local(p):
        u = p - ro[:, None, :]
        return jnp.stack([
            jnp.sum(u * xh[:, None, :], axis=-1),
            ecc * jnp.sum(u * yh[:, None, :], axis=-1),
            jnp.sum(u * rd[:, None, :], axis=-1)], axis=-1)

    A = to_local(row[..., 0:3])
    B = to_local(row[..., 0:3] + row[..., 3:6])
    C = to_local(row[..., 0:3] + row[..., 6:9])
    z, _, ok = ci.intersect_cone_tri(
        env.x0[:, None], env.ta[:, None], A, B, C,
        jnp.full((N, J), zmin), jnp.broadcast_to(zmax[:, None], (N, J)))
    ok = ok & in_range
    zk = jnp.where(ok, z, jnp.inf)
    neg, selk = jax.lax.top_k(-zk, K)
    best_z = -neg
    best_i = jnp.take_along_axis(cand, selk, axis=1)
    valid = jnp.isfinite(best_z)
    return (jnp.where(valid, best_i, -1), best_z,
            valid.sum(axis=1).astype(jnp.int32))


def cone_tri_entry_point(geo: GeoArrays, ro, rd, env, tri, zmin, zmax):
    """Entry distance + world point of the cone into ONE triangle per
    lane (reference intersect_cone_tri return, cone.hpp:550-627). tri
    (N,) i32 (−1 → invalid). Returns (z (N,), p (N, 3), valid)."""
    from wave_tracer_tpu.ops import cone_intersect as ci
    ti = jnp.maximum(tri, 0)
    row = geo.tri_geom[ti]
    xh = env.x
    yh = jnp.cross(rd, xh)

    def to_local(p):
        u = p - ro
        return jnp.stack([
            jnp.sum(u * xh, axis=-1),
            env.e * jnp.sum(u * yh, axis=-1),
            jnp.sum(u * rd, axis=-1)], axis=-1)

    A = to_local(row[:, 0:3])
    B = to_local(row[:, 0:3] + row[:, 3:6])
    C = to_local(row[:, 0:3] + row[:, 6:9])
    z, p, ok = ci.intersect_cone_tri(env.x0, env.ta, A, B, C, zmin, zmax)
    inv_e = 1.0 / jnp.maximum(env.e, 1.0)
    pw = ro + p[..., 0:1] * xh + (p[..., 1] * inv_e)[..., None] * yh \
        + p[..., 2:3] * rd
    return z, pw, ok & (tri >= 0)


@struct.dataclass
class SurfaceHit:
    """Interpolated surface interaction (reference
    include/wt/interaction/intersection.hpp:33-225, SoA)."""
    p: jnp.ndarray         # (N, 3) world hit position
    t: jnp.ndarray         # (N,) distance
    tri: jnp.ndarray       # (N,) i32, -1 = miss
    valid: jnp.ndarray     # (N,) bool
    uv: jnp.ndarray        # (N, 2)
    geo_n: jnp.ndarray     # (N, 3) geometric normal (as stored)
    ns: jnp.ndarray        # (N, 3) interpolated shading normal
    dpdu: jnp.ndarray      # (N, 3)
    front: jnp.ndarray     # (N,) bool — ray hit the front face
    mat_id: jnp.ndarray    # (N,) i32
    shape_id: jnp.ndarray  # (N,) i32
    emitter_id: jnp.ndarray  # (N,) i32


def hit_attributes(geo: GeoArrays, ro, rd, t, tri, u, v) -> SurfaceHit:
    valid = tri >= 0
    ti = jnp.where(valid, tri, 0)
    row = geo.tri_attr[ti]      # ONE packed gather (layout: from_soup)
    w = 1.0 - u - v
    uv = (w[:, None] * row[:, 9:11] + u[:, None] * row[:, 11:13]
          + v[:, None] * row[:, 13:15])
    ns = (w[:, None] * row[:, 0:3] + u[:, None] * row[:, 3:6]
          + v[:, None] * row[:, 6:9])
    nlen = jnp.sqrt(jnp.maximum(jnp.sum(ns * ns, axis=-1, keepdims=True),
                                1e-30))
    ns = ns / nlen
    gn = row[:, 15:18]
    front = jnp.sum(rd * gn, axis=-1) < 0.0
    tsafe = jnp.where(valid, t, 0.0)
    return SurfaceHit(
        p=ro + tsafe[:, None] * rd,
        t=tsafe, tri=tri, valid=valid, uv=uv, geo_n=gn, ns=ns,
        dpdu=row[:, 18:21], front=front,
        mat_id=jnp.where(valid, row[:, 21].astype(jnp.int32), -1),
        shape_id=jnp.where(valid, row[:, 22].astype(jnp.int32), -1),
        emitter_id=jnp.where(valid, row[:, 23].astype(jnp.int32), -1),
    )
