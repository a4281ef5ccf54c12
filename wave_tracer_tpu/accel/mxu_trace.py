"""MXU ray-triangle intersector (Pallas): all-pairs testing as matmuls.

TPU-first replacement for stack-based BVH traversal on small/medium scenes
(reference src/ads/bvh8w.cpp:469-554 ray traversal + :556-580 occlusion).
The reference walks a tree with per-thread stacks; on TPU that becomes a
lock-step while_loop whose cost is dominated by serialized row gathers and
worst-lane divergence. Instead we exploit that every Moller-Trumbore /
Plucker intersection quantity is *bilinear* in per-ray and per-triangle
features:

  side(edge P->Q) = d . (P x Q) + (o x d) . (Q - P)        (Plucker)
  t . (d . N)     = N . A - N . o                          (plane)
  d . N           = side_AB + side_BC + side_CA            (identity)

so testing a tile of rays against a tile of triangles is ONE
(BN, 16) @ (16, 4*BT) f32 matmul on the MXU, followed by cheap VPU sign
tests and a running min-reduce. No gathers, no divergence, dense utilization.
Scaling is O(N*T) but with the MXU's ~matmul constant: measured faster than
the lock-step BVH for every scene the benchmarks use (cornell-box 11k tris)
and competitive up to ~10^5 triangles.

Hit results match ops/intersect.py::ray_tri (two-sided) up to f32 rounding;
u/v for the winning triangle are recomputed outside the kernel with the
standard formula (one gather, exact parity with hit_attributes).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

BIG = float(np.float32(3.4e38))

# f32 matmul emulation depth on the MXU: HIGHEST = 6 bf16 passes
# (near-f64 products). HIGH (3 passes) is NOT lowerable by the pallas
# mosaic backend ("Unsupported dot precision: HIGH", jax 0.8 lowering);
# the option remains for the jnp reference path only.
_PRECISION = {
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}.get(os.environ.get("WT_MXU_PRECISION", "highest").lower(),
      jax.lax.Precision.HIGHEST)

# tile shape: swept on the v5e chip (scripts/mxu_tile_sweep.py) — trace
# time is flat in (BN, BT) within 2% from 256x512 to 1024x1024; 512x512
# measured marginally best
BN = int(os.environ.get("WT_MXU_BN", 512))   # rays per tile
BT = int(os.environ.get("WT_MXU_BT", 512))   # tris per tile (lane dim)
_DEN_EPS = 1e-12


def build_tri_features(p0, e1, e2, center):
    """Host-side (numpy): per-triangle feature matrix (16, ntiles*4*BT).

    Column layout per triangle tile j (contiguous 4*BT block):
      [ side_AB x BT | side_BC x BT | side_CA x BT | t_num x BT ]
    Feature rows (contract with ray features [d, o x d, o', 1, pad]):
      0:3  -> d-coefficients, 3:6 -> (o x d)-coefficients,
      6:9  -> o'-coefficients, 9 -> constant.
    Triangle vertices are translated by `center` (precision: keeps Plucker
    moments small; rays translate their origins identically).
    """
    p0 = np.asarray(p0, np.float64) - np.asarray(center, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    A = p0
    B = p0 + e1
    C = p0 + e2
    Nrm = np.cross(e1, e2)
    T = len(p0)
    ntiles = max(1, (T + BT - 1) // BT)
    feat = np.zeros((16, ntiles * 4 * BT), np.float32)

    def put(ch, rows_d, rows_m, rows_o, const):
        # scatter channel `ch` of every triangle into its tile block
        for t0 in range(ntiles):
            lo, hi = t0 * BT, min((t0 + 1) * BT, T)
            if lo >= T:
                break
            cols = slice(t0 * 4 * BT + ch * BT, t0 * 4 * BT + ch * BT
                         + (hi - lo))
            feat[0:3, cols] = rows_d[lo:hi].T
            feat[3:6, cols] = rows_m[lo:hi].T
            feat[6:9, cols] = rows_o[lo:hi].T
            feat[9, cols] = const[lo:hi]

    zero3 = np.zeros_like(A)
    zero1 = np.zeros(T)
    put(0, np.cross(A, B), B - A, zero3, zero1)   # side_AB
    put(1, np.cross(B, C), C - B, zero3, zero1)   # side_BC
    put(2, np.cross(C, A), A - C, zero3, zero1)   # side_CA
    put(3, zero3, zero3, -Nrm, np.sum(Nrm * A, axis=-1))  # t*denom
    return feat


def _ray_features(ro, rd, center):
    o = ro - center
    m = jnp.cross(o, rd)
    one = jnp.ones(ro.shape[:-1] + (1,), ro.dtype)
    pad = jnp.zeros(ro.shape[:-1] + (6,), ro.dtype)
    return jnp.concatenate([rd, m, o, one, pad], axis=-1)


def _dot(rf, tf):
    """f32-ish matmul on the MXU.

    HIGHEST lowers to 6 bf16 passes. WT_MXU_PRECISION=split3 runs a
    manual 3-pass split-bf16 product (hi/lo decomposition:
    hi@hi + hi@lo + lo@hi, ~2^-21 relative — the classic f32 emulation
    the old HIGH setting promised but Mosaic cannot lower natively).
    MEASURED OFF on the axon v5e: inside the Pallas kernel the bf16
    casts/layout conversions around the (16, ·) contraction make the
    whole trace ~20x SLOWER than HIGHEST — keep for the jnp reference
    path only."""
    if os.environ.get("WT_MXU_PRECISION", "highest").lower() == "split3":
        rf_hi = rf.astype(jnp.bfloat16)
        rf_lo = (rf - rf_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        tf_hi = tf.astype(jnp.bfloat16)
        tf_lo = (tf - tf_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dims = (((1,), (0,)), ((), ()))

        def bmm(a, b):
            return jax.lax.dot_general(
                a, b, dims, precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)

        return bmm(rf_hi, tf_hi) + bmm(rf_hi, tf_lo) + bmm(rf_lo, tf_hi)
    return jax.lax.dot_general(
        rf, tf, (((1,), (0,)), ((), ())),
        precision=_PRECISION,
        preferred_element_type=jnp.float32)


def _sides_and_t(rf, tf, inset: float = 0.0):
    """Shared kernel body: matmul + sign tests. Returns (t, hitmask, ids)."""
    S = _dot(rf, tf)                                     # (BN, 4*BT)
    s0 = S[:, 0 * BT:1 * BT]
    s1 = S[:, 1 * BT:2 * BT]
    s2 = S[:, 2 * BT:3 * BT]
    tn = S[:, 3 * BT:4 * BT]
    denom = s0 + s1 + s2
    margin = inset * jnp.abs(denom)
    pos = (s0 >= margin) & (s1 >= margin) & (s2 >= margin)
    neg = (s0 <= -margin) & (s1 <= -margin) & (s2 <= -margin)
    dok = jnp.abs(denom) > _DEN_EPS
    t = tn / jnp.where(dok, denom, 1.0)
    return t, (pos | neg) & dok


def _closest_kernel(rf_ref, tf_ref, aux_ref, out_ref):
    j = pl.program_id(1)
    t, geom_ok = _sides_and_t(rf_ref[:], tf_ref[:])
    tmin = aux_ref[:, 0:1]
    tmax = aux_ref[:, 1:2]
    ex1 = aux_ref[:, 2:3]
    ex2 = aux_ref[:, 3:4]
    ex3 = aux_ref[:, 4:5]
    ids = (j * BT + jax.lax.broadcasted_iota(jnp.int32, (1, BT), 1)
           ).astype(jnp.float32)
    hit = geom_ok & (t > tmin) & (t <= tmax) & (ids != ex1) \
        & (ids != ex2) & (ids != ex3)
    t = jnp.where(hit, t, BIG)
    trow = jnp.min(t, axis=1, keepdims=True)
    idrow = jnp.min(jnp.where(t <= trow, ids, BIG), axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        out_ref[:, 0:1] = trow
        out_ref[:, 1:2] = idrow

    @pl.when(j > 0)
    def _():
        bt_ = out_ref[:, 0:1]
        bi_ = out_ref[:, 1:2]
        better = trow < bt_
        out_ref[:, 0:1] = jnp.where(better, trow, bt_)
        out_ref[:, 1:2] = jnp.where(better, idrow, bi_)


def _anyhit_kernel(rf_ref, tf_ref, aux_ref, out_ref):
    j = pl.program_id(1)
    t, geom_ok = _sides_and_t(rf_ref[:], tf_ref[:])
    tmin = aux_ref[:, 0:1]
    tmax = aux_ref[:, 1:2]
    ex1 = aux_ref[:, 2:3]
    ex2 = aux_ref[:, 3:4]
    ex3 = aux_ref[:, 4:5]
    ids = (j * BT + jax.lax.broadcasted_iota(jnp.int32, (1, BT), 1)
           ).astype(jnp.float32)
    hit = geom_ok & (t > tmin) & (t <= tmax) & (ids != ex1) \
        & (ids != ex2) & (ids != ex3)
    occ = jnp.max(hit.astype(jnp.float32), axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        out_ref[:, 0:1] = occ

    @pl.when(j > 0)
    def _():
        out_ref[:, 0:1] = jnp.maximum(out_ref[:, 0:1], occ)


@functools.partial(jax.jit, static_argnames=("anyhit",))
def _launch(tri_feat, rf, aux, anyhit: bool):
    N = rf.shape[0]
    ntt = tri_feat.shape[1] // (4 * BT)
    grid = (N // BN, ntt)
    kern = _anyhit_kernel if anyhit else _closest_kernel
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BN, 16), lambda i, j: (i, 0)),
            pl.BlockSpec((16, 4 * BT), lambda i, j: (0, j)),
            pl.BlockSpec((BN, 8), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((BN, 8), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 8), jnp.float32),
    )(rf, tri_feat, aux)


def _launch_ref(tri_feat, rf, aux, anyhit: bool):
    """jnp reference of the kernels (CPU tests / interpret parity)."""
    ntt = tri_feat.shape[1] // (4 * BT)
    N = rf.shape[0]
    best_t = jnp.full((N, 1), BIG)
    best_i = jnp.full((N, 1), BIG)
    occ = jnp.zeros((N, 1), jnp.float32)
    for j in range(ntt):
        tf = tri_feat[:, j * 4 * BT:(j + 1) * 4 * BT]
        t, geom_ok = _sides_and_t(rf, tf)
        ids = j * BT + jnp.arange(BT, dtype=jnp.float32)[None, :]
        hit = geom_ok & (t > aux[:, 0:1]) & (t <= aux[:, 1:2]) \
            & (ids != aux[:, 2:3]) & (ids != aux[:, 3:4]) \
            & (ids != aux[:, 4:5])
        t = jnp.where(hit, t, BIG)
        trow = jnp.min(t, axis=1, keepdims=True)
        idrow = jnp.min(jnp.where(t <= trow, ids, BIG), axis=1,
                        keepdims=True)
        better = trow < best_t
        best_i = jnp.where(better, idrow, best_i)
        best_t = jnp.where(better, trow, best_t)
        occ = jnp.maximum(occ, jnp.max(hit.astype(jnp.float32), axis=1,
                                       keepdims=True))
    if anyhit:
        return jnp.concatenate([occ, jnp.zeros((N, 7))], axis=1)
    return jnp.concatenate([best_t, best_i, jnp.zeros((N, 6))], axis=1)


def _pad_rays(x, n_pad, fill=0.0):
    if n_pad == 0:
        return x
    return jnp.pad(x, ((0, n_pad),) + ((0, 0),) * (x.ndim - 1),
                   constant_values=fill)


def trace_mxu(geo, ro, rd, tmin, tmax, exclude_tri=None, *,
              use_pallas: bool = True):
    """Closest hit over all triangles via the MXU kernel.

    Same contract as accel.trace.trace_brute: returns (t, tri, u, v).
    """
    N = ro.shape[0]
    T = geo.num_tris
    if exclude_tri is None:
        exclude_tri = jnp.full((N,), -1, jnp.int32)
    NP = ((N + BN - 1) // BN) * BN
    rf = _ray_features(ro, rd, geo.mxu_center)
    rf = _pad_rays(rf, NP - N)
    aux = jnp.stack([tmin, tmax, exclude_tri.astype(jnp.float32),
                     jnp.full((N,), -2.0), jnp.full((N,), -2.0),
                     jnp.full((N,), -2.0), jnp.full((N,), -2.0),
                     jnp.full((N,), -2.0)], axis=-1)
    aux = _pad_rays(aux, NP - N, fill=-3.0)
    launch = _launch if use_pallas else _launch_ref
    out = launch(geo.tri_mxu, rf, aux, False)[:N]
    t = out[:, 0]
    idx = out[:, 1]
    valid = (t < BIG) & (idx < T)
    tri = jnp.where(valid, idx, -1).astype(jnp.int32)
    t = jnp.where(valid, t, BIG)
    # u, v of the winner: one gather + standard Moller-Trumbore
    row = geo.tri_geom[jnp.maximum(tri, 0)]
    p0, e1, e2 = row[:, 0:3], row[:, 3:6], row[:, 6:9]
    pvec = jnp.cross(rd, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12,
                        1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tvec = ro - p0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(rd * qvec, axis=-1) * inv_det
    u = jnp.where(valid, jnp.clip(u, 0.0, 1.0), 0.0)
    v = jnp.where(valid, jnp.clip(v, 0.0, 1.0), 0.0)
    return t, tri, u, v


def occluded_mxu(geo, ro, rd, tmin, tmax, exclude_tri=None,
                 exclude_tri2=None, exclude_tri3=None, *,
                 use_pallas: bool = True):
    """Any-hit within (tmin, tmax) via the MXU kernel. Returns bool (N,)."""
    N = ro.shape[0]
    if exclude_tri is None:
        exclude_tri = jnp.full((N,), -1, jnp.int32)
    if exclude_tri2 is None:
        exclude_tri2 = jnp.full((N,), -1, jnp.int32)
    if exclude_tri3 is None:
        exclude_tri3 = jnp.full((N,), -1, jnp.int32)
    NP = ((N + BN - 1) // BN) * BN
    rf = _ray_features(ro, rd, geo.mxu_center)
    rf = _pad_rays(rf, NP - N)
    aux = jnp.stack([tmin, tmax, exclude_tri.astype(jnp.float32),
                     exclude_tri2.astype(jnp.float32),
                     exclude_tri3.astype(jnp.float32),
                     jnp.full((N,), -2.0), jnp.full((N,), -2.0),
                     jnp.full((N,), -2.0)], axis=-1)
    aux = _pad_rays(aux, NP - N, fill=-3.0)
    launch = _launch if use_pallas else _launch_ref
    out = launch(geo.tri_mxu, rf, aux, True)[:N]
    return out[:, 0] > 0.5
