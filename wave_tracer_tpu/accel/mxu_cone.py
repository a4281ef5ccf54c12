"""Pallas TPU kernel for the dense exact cone-triangle boundary sweep.

`accel.trace.cone_boundary_minz` — the wave kernel's hot query — runs
the EXACT elliptic cone-triangle entry test (ops/cone_intersect.py,
reference include/wt/math/intersect/cone.hpp:550-627) against every
triangle and keeps only per-schedule-boundary earliest entries. The XLA
version materialises several (lanes, tile) f32 temporaries in HBM
between fusion boundaries; at 16k lanes x 512-tri tiles that is ~32 MB
per temporary, and the sweep becomes HBM-bound (CLAUDE.md perf model;
VERDICT r4 item 6 prescribes exactly this kernel).

This module keeps the whole pair-block resident in VMEM:

* ONE (BN, 16) @ (16, 12*BT) MXU matmul produces, per (lane, tri) pair,
  the 9 LOCAL SCALED vertex coordinates (the per-lane cone frame with
  eccentricity-scaled y — the same bilinear trick as the ray
  intersector accel/mxu_trace.py) plus the local triangle normal;
* the exact entry math (edge quadratics, vertex containment, central
  axis hit, conic near point) then runs on (BN, BT) VPU blocks without
  touching HBM;
* the output is only (BN, 32) per lane tile: 16 per-boundary minima, an
  encounter count, accumulated across triangle tiles with running mins.

The block math `_minz_block` is shared verbatim by the pallas kernel
and a pure-jnp reference launcher (CPU tests / interpret parity); an
equivalence test pins it against ops.cone_intersect.intersect_cone_tri
(tests/test_mxu_cone.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

BIG = 1e30
_EPS = 1e-12
NB = 16                     # schedule boundaries (traversal.py)
BN = 256                    # lanes per tile
BT = 512                    # tris per tile
_CH = 12                    # feature channels per tri (9 coords + n)

_PRECISION = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# features
# ---------------------------------------------------------------------------

def build_cone_tri_features(p0, e1, e2):
    """Host-side (numpy): (16, ntiles*_CH*BT) per-triangle features.

    Channel c of triangle tile j lives in columns
    [j*_CH*BT + c*BT, ...+BT). Channels 0-8: vertex A/B/C world coords
    (x, y, z interleaved per vertex: A(0..2) B(3..5) C(6..8)) as
    [v, 1]-columns so the lane rows [axis | -axis.ro] produce local
    coordinates; channels 9-11: the world triangle normal n = e1 x e2
    (copied through rows 12:15) for the axis/conic tests."""
    p0 = np.asarray(p0, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    A, B, C = p0, p0 + e1, p0 + e2
    n = np.cross(e1, e2)
    T = len(p0)
    ntiles = max(1, (T + BT - 1) // BT)
    feat = np.zeros((16, ntiles * _CH * BT), np.float32)

    def put(ch, rows_v, const_row=None, nrow=None):
        for t0 in range(ntiles):
            lo, hi = t0 * BT, min((t0 + 1) * BT, T)
            if lo >= T:
                break
            cols = slice(t0 * _CH * BT + ch * BT,
                         t0 * _CH * BT + ch * BT + (hi - lo))
            if rows_v is not None:
                feat[0:3, cols] = rows_v[lo:hi].T
                feat[9, cols] = 1.0
            if nrow is not None:
                feat[12:15, cols] = nrow[lo:hi].T

    for vi, V in enumerate((A, B, C)):
        for axis in range(3):
            # every coord channel carries the full vertex; the LANE row
            # selects the axis (x/y/z rows of the frame live in rows
            # 0:3/3:6/6:9 of the lane features — see _lane_features)
            pass
    # the lane-side needs per-channel frame selection, so coordinates
    # cannot share columns; instead each channel stores the vertex in
    # rows 0:3 and 1 in row 9, and the LANE matrix is per-channel. That
    # is not expressible in one matmul — so the layout actually used
    # packs the vertex into the rows matching its channel's frame axis:
    #   channel 3*vi+0 (x): rows 0:3 = V, row 9  = 1   (lane: xh | -xh.ro)
    #   channel 3*vi+1 (y): rows 3:6 = V, row 10 = 1   (lane: e.yh | ...)
    #   channel 3*vi+2 (z): rows 6:9 = V, row 11 = 1   (lane: rd | ...)
    for vi, V in enumerate((A, B, C)):
        for axis in range(3):
            ch = 3 * vi + axis
            for t0 in range(ntiles):
                lo, hi = t0 * BT, min((t0 + 1) * BT, T)
                if lo >= T:
                    break
                cols = slice(t0 * _CH * BT + ch * BT,
                             t0 * _CH * BT + ch * BT + (hi - lo))
                feat[3 * axis:3 * axis + 3, cols] = V[lo:hi].T
                feat[9 + axis, cols] = 1.0
    # normal channels (world n dotted with the lane frame rows)
    for axis in range(3):
        ch = 9 + axis
        for t0 in range(ntiles):
            lo, hi = t0 * BT, min((t0 + 1) * BT, T)
            if lo >= T:
                break
            cols = slice(t0 * _CH * BT + ch * BT,
                         t0 * _CH * BT + ch * BT + (hi - lo))
            feat[3 * axis:3 * axis + 3, cols] = n[lo:hi].T
    return feat


def _lane_features(ro, xh, yh_e, rd):
    """(N, 16) lane rows: [xh | e*yh | rd | -xh.ro, -e*yh.ro, -rd.ro |
    pad]. Contracting with a coord channel (vertex in the frame-axis
    rows + 1 in the offset row) yields the local scaled coordinate;
    contracting with a normal channel yields the local normal component
    (no offset row set -> pure rotation)."""
    f = jnp.concatenate([
        xh, yh_e, rd,
        -jnp.sum(xh * ro, axis=-1, keepdims=True),
        -jnp.sum(yh_e * ro, axis=-1, keepdims=True),
        -jnp.sum(rd * ro, axis=-1, keepdims=True),
        jnp.zeros(ro.shape[:-1] + (4,), ro.dtype)], axis=-1)
    return f


# ---------------------------------------------------------------------------
# exact entry math on component blocks (shared pallas / jnp-reference)
# ---------------------------------------------------------------------------

def _safe_div(a, b):
    return a / jnp.where(jnp.abs(b) < _EPS,
                         jnp.where(b < 0, -_EPS, _EPS), b)


def _edge_entry_z(Ax, Ay, Az, Bx, By, Bz, x0, ta, zlo_eff, zmin, zmax):
    """Minimal-z of segment AB inside the circular cone r = x0 + ta z
    (component port of ops.cone_intersect.cone_edge_entry)."""
    Ex, Ey, Ez = Bx - Ax, By - Ay, Bz - Az
    r0 = x0 + ta * Az
    a = Ex * Ex + Ey * Ey - (ta * Ez) ** 2
    b = 2.0 * (Ax * Ex + Ay * Ey - ta * Ez * r0)
    c = Ax * Ax + Ay * Ay - r0 * r0
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    qq = -0.5 * (b + jnp.sign(b) * sq)
    s_r1 = _safe_div(qq, a)
    s_r2 = _safe_div(c, qq)
    lin = jnp.abs(a) < _EPS
    s_lin = _safe_div(-c, b)
    s_r1 = jnp.where(lin, s_lin, s_r1)
    s_r2 = jnp.where(lin, s_lin, s_r2)
    # NOTE: select on i1 operands fails Mosaic lowering ("Unsupported
    # target bitwidth for truncation") — use logical ops, not where
    roots_ok = (lin & (jnp.abs(b) >= _EPS)) | (~lin & (disc >= 0.0))
    s_zlo = _safe_div(zmin - Az, Ez)
    s_zhi = _safe_div(zmax - Az, Ez)

    best = jnp.full(Ax.shape, BIG)
    tol = 1e-6 * jnp.maximum(r0 * r0, 1.0)
    for s_c, extra in ((s_r1, roots_ok), (s_r2, roots_ok),
                       (jnp.zeros_like(s_r1), None),
                       (jnp.ones_like(s_r1), None),
                       (s_zlo, None), (s_zhi, None)):
        s = jnp.clip(s_c, 0.0, 1.0)
        q = (a * s + b) * s + c
        z = Az + s * Ez
        ok = (q <= tol) & (z >= zlo_eff) & (z <= zmax)
        if extra is not None:
            ok = ok & extra
        best = jnp.where(ok & (z < best), z, best)
    return best


def _point_in_tri_2d(px, py, ax, ay, bx, by, cx, cy):
    def edge(ux, uy, vx, vy):
        return (vx - ux) * (py - uy) - (vy - uy) * (px - ux)
    e0 = edge(ax, ay, bx, by)
    e1 = edge(bx, by, cx, cy)
    e2 = edge(cx, cy, ax, ay)
    pos = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
    neg = (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
    return pos | neg


def _minz_block(S, x0, ta, zmax, exclude, tri0, T, zmin):
    """Exact minimal entry z per (lane, tri) pair from the matmul block.

    S: (BN, _CH*BT) matmul output; lane scalars (BN, 1); tri0: first
    global triangle id of this tile. Returns (z (BN, BT) BIG-padded,
    ok (BN, BT))."""
    Ax, Ay, Az = S[:, 0 * BT:1 * BT], S[:, 1 * BT:2 * BT], \
        S[:, 2 * BT:3 * BT]
    Bx, By, Bz = S[:, 3 * BT:4 * BT], S[:, 4 * BT:5 * BT], \
        S[:, 5 * BT:6 * BT]
    Cx, Cy, Cz = S[:, 6 * BT:7 * BT], S[:, 7 * BT:8 * BT], \
        S[:, 8 * BT:9 * BT]
    nx, ny, nz = S[:, 9 * BT:10 * BT], S[:, 10 * BT:11 * BT], \
        S[:, 11 * BT:12 * BT]

    apex = -_safe_div(x0, jnp.maximum(ta, _EPS))
    zlo_eff = jnp.maximum(zmin, jnp.where(ta > 0, apex, -BIG))

    best = jnp.full(Ax.shape, BIG)

    # 1. vertices inside the cone
    for (Vx, Vy, Vz) in ((Ax, Ay, Az), (Bx, By, Bz), (Cx, Cy, Cz)):
        r = x0 + ta * Vz
        ok = (Vz >= zlo_eff) & (Vz <= zmax) \
            & (Vx * Vx + Vy * Vy <= r * r)
        best = jnp.where(ok & (Vz < best), Vz, best)

    # 2. edge entries
    for (P, Q) in (((Ax, Ay, Az), (Bx, By, Bz)),
                   ((Ax, Ay, Az), (Cx, Cy, Cz)),
                   ((Bx, By, Bz), (Cx, Cy, Cz))):
        z = _edge_entry_z(P[0], P[1], P[2], Q[0], Q[1], Q[2],
                          x0, ta, zlo_eff, zmin, zmax)
        best = jnp.minimum(best, z)

    # 3. central-axis hit (n is the LOCAL-frame normal; the frame is a
    # y-scaled rotation so n stays normal to the local triangle up to a
    # per-axis scale -- recompute exactly from local edges instead)
    e1x, e1y, e1z = Bx - Ax, By - Ay, Bz - Az
    e2x, e2y, e2z = Cx - Ax, Cy - Ay, Cz - Az
    lnx = e1y * e2z - e1z * e2y
    lny = e1z * e2x - e1x * e2z
    lnz = e1x * e2y - e1y * e2x
    d = lnx * Ax + lny * Ay + lnz * Az
    z_ax = _safe_div(d, lnz)
    in_ax = _point_in_tri_2d(jnp.zeros_like(Ax), jnp.zeros_like(Ax),
                             Ax, Ay, Bx, By, Cx, Cy)
    ok_ax = in_ax & (jnp.abs(lnz) > _EPS) & (z_ax >= zmin) \
        & (z_ax <= zmax) & (z_ax >= zlo_eff)
    best = jnp.where(ok_ax & (z_ax < best), z_ax, best)

    # 4. conic near point inside the triangle (cone_plane_entry port)
    rho = jnp.sqrt(lnx * lnx + lny * lny)
    a1 = rho * ta + lnz
    b1 = d - rho * x0
    a2 = rho * ta - lnz
    b2 = -d - rho * x0

    def bound(a, b):
        lo = jnp.where(a > _EPS, b / jnp.maximum(a, _EPS), -BIG)
        hi = jnp.where(a < -_EPS, b / jnp.minimum(a, -_EPS), BIG)
        infeasible = (jnp.abs(a) <= _EPS) & (b > 0)
        return jnp.where(infeasible, BIG, lo), \
            jnp.where(infeasible, -BIG, hi)

    lo1, hi1 = bound(a1, b1)
    lo2, hi2 = bound(a2, b2)
    z_lo = jnp.maximum(jnp.maximum(lo1, lo2), zlo_eff)
    z_hi = jnp.minimum(jnp.minimum(hi1, hi2), zmax)
    ok_c = z_lo <= z_hi
    z_c = z_lo
    r = x0 + ta * z_c
    sgn = jnp.sign(d - lnz * z_c)
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    safe_rho = jnp.maximum(rho, _EPS)
    px = sgn * r / safe_rho * lnx
    py = sgn * r / safe_rho * lny
    perp = rho <= _EPS
    z_perp = _safe_div(d, lnz)
    z_c = jnp.where(perp, z_perp, z_c)
    px = jnp.where(perp, 0.0, px)
    py = jnp.where(perp, 0.0, py)
    # (no where-on-bool: Mosaic cannot lower i1 selects)
    ok_c = (perp & (z_perp >= zmin) & (z_perp <= zmax)) \
        | (~perp & ok_c)
    # in-triangle test: project along the largest local-normal axis
    anx, any_, anz = jnp.abs(lnx), jnp.abs(lny), jnp.abs(lnz)
    use_x = (anx >= any_) & (anx >= anz)     # drop x
    use_y = (~use_x) & (any_ >= anz)         # drop y

    def proj(vx, vy, vz):
        u = jnp.where(use_x, vy, vx)
        v = jnp.where(use_x | use_y, vz, vy)
        return u, v

    pu, pv = proj(px, py, z_c)
    au, av = proj(Ax, Ay, Az)
    bu, bv = proj(Bx, By, Bz)
    cu, cv = proj(Cx, Cy, Cz)
    in_c = _point_in_tri_2d(pu, pv, au, av, bu, bv, cu, cv)
    z_c = jnp.where(ok_c & in_c, z_c, BIG)
    best = jnp.minimum(best, z_c)

    ids = tri0 + jax.lax.broadcasted_iota(jnp.int32, (1, BT), 1)
    ok = (best < BIG) & (ids < T) \
        & (ids.astype(jnp.float32) != exclude)
    return jnp.where(ok, best, BIG), ok


# ---------------------------------------------------------------------------
# pallas kernel + launchers
# ---------------------------------------------------------------------------

def _minz_kernel(lf_ref, tf_ref, aux_ref, bnd_ref, out_ref, *, T, zmin):
    j = pl.program_id(1)
    S = jax.lax.dot_general(
        lf_ref[:], tf_ref[:], (((1,), (0,)), ((), ())),
        precision=_PRECISION,
        preferred_element_type=jnp.float32)
    x0 = aux_ref[:, 0:1]
    ta = aux_ref[:, 1:2]
    zmax = aux_ref[:, 2:3]
    exclude = aux_ref[:, 3:4]
    z, ok = _minz_block(S, x0, ta, zmax, exclude, j * BT, T, zmin)

    cnt = jnp.sum(ok.astype(jnp.float32), axis=1, keepdims=True)
    mins = []
    for b in range(NB):
        zb = jnp.where(z >= bnd_ref[:, b:b + 1], z, BIG)
        mins.append(jnp.min(zb, axis=1, keepdims=True))
    mins = jnp.concatenate(mins, axis=1)                  # (BN, NB)

    @pl.when(j == 0)
    def _():
        out_ref[:, 0:NB] = mins
        out_ref[:, NB:NB + 1] = cnt
        out_ref[:, NB + 1:] = jnp.zeros_like(out_ref[:, NB + 1:])

    @pl.when(j > 0)
    def _():
        out_ref[:, 0:NB] = jnp.minimum(out_ref[:, 0:NB], mins)
        out_ref[:, NB:NB + 1] = out_ref[:, NB:NB + 1] + cnt


@functools.partial(jax.jit, static_argnames=("T", "zmin"))
def _launch(tri_feat, lf, aux, bnd, T: int, zmin: float):
    N = lf.shape[0]
    ntt = tri_feat.shape[1] // (_CH * BT)
    grid = (N // BN, ntt)
    return pl.pallas_call(
        functools.partial(_minz_kernel, T=T, zmin=zmin),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BN, 16), lambda i, j: (i, 0)),
            pl.BlockSpec((16, _CH * BT), lambda i, j: (0, j)),
            pl.BlockSpec((BN, 8), lambda i, j: (i, 0)),
            pl.BlockSpec((BN, NB), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((BN, 32), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 32), jnp.float32),
    )(lf, tri_feat, aux, bnd)


def _launch_ref(tri_feat, lf, aux, bnd, T: int, zmin: float):
    """jnp reference of the kernel (CPU tests / parity)."""
    N = lf.shape[0]
    ntt = tri_feat.shape[1] // (_CH * BT)
    out_min = jnp.full((N, NB), BIG)
    out_cnt = jnp.zeros((N, 1))
    x0 = aux[:, 0:1]
    ta = aux[:, 1:2]
    zmax = aux[:, 2:3]
    exclude = aux[:, 3:4]
    for j in range(ntt):
        tf = tri_feat[:, j * _CH * BT:(j + 1) * _CH * BT]
        S = jax.lax.dot_general(
            lf, tf, (((1,), (0,)), ((), ())),
            precision=_PRECISION, preferred_element_type=jnp.float32)
        z, ok = _minz_block(S, x0, ta, zmax, exclude, j * BT, T, zmin)
        out_cnt = out_cnt + jnp.sum(ok.astype(jnp.float32), axis=1,
                                    keepdims=True)
        for b in range(NB):
            zb = jnp.where(z >= bnd[:, b:b + 1], z, BIG)
            out_min = out_min.at[:, b].min(jnp.min(zb, axis=1))
    return jnp.concatenate(
        [out_min, out_cnt, jnp.zeros((N, 32 - NB - 1))], axis=1)


def cone_boundary_minz_mxu(geo, ro, rd, env, bounds, zmax,
                           zmin: float = 1e-7, exclude_tri=None, *,
                           use_pallas: bool = True):
    """Drop-in for accel.trace.cone_boundary_minz on the MXU/VMEM path.

    Same contract: (zc (N, NB) per-boundary minima (inf = none ahead),
    cnt (N,) exact encounter count). Requires geo.cone_feat (built by
    GeoArrays.from_soup)."""
    T = geo.num_tris
    N = ro.shape[0]
    if T == 0:
        return (jnp.full((N, bounds.shape[1]), jnp.inf),
                jnp.zeros((N,), jnp.int32))
    if exclude_tri is None:
        exclude_tri = jnp.full((N,), -1, jnp.int32)
    xh = env.x
    yh = jnp.cross(rd, xh)
    lf = _lane_features(ro, xh, env.e[:, None] * yh, rd)
    NP = ((N + BN - 1) // BN) * BN
    pad = NP - N

    def padr(x, fill=0.0):
        if pad == 0:
            return x
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    aux = jnp.stack([env.x0, env.ta, zmax,
                     exclude_tri.astype(jnp.float32)] + [
        jnp.zeros((N,))] * 4, axis=-1)
    B = bounds.shape[1]
    bnd = bounds
    if B < NB:
        bnd = jnp.pad(bounds, ((0, 0), (0, NB - B)),
                      constant_values=BIG)
    launch = _launch if use_pallas else _launch_ref
    out = launch(geo.cone_feat, padr(lf), padr(aux, fill=1.0),
                 padr(bnd, fill=BIG), T, float(zmin))[:N]
    zc = out[:, :B]
    zc = jnp.where(zc >= BIG, jnp.inf, zc)
    return zc, out[:, NB].astype(jnp.int32)
