"""Free-space diffraction (UTD flavour) — batched apertures.

The plt_path FSD machinery of reference
src/interaction/fsd/free_space_diffraction.cpp:23-235 as lane-batched SoA:
an aperture is K wedge-edge slots per lane, built from the edges found
inside a beam's interaction footprint; `fsd_eval` computes per-edge UTD
coefficients at Fermat points; `fsd_sample`/`fsd_pdf` implement the
edge-or-direct importance strategy with Gaussian Keller-cone azimuth
proposals of σ = sqrt(45/(k·ri)).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from wave_tracer_tpu.accel.edges import EdgeTable
from wave_tracer_tpu.math import vec
from wave_tracer_tpu.wave import utd

SIGMA_SCALE = 45.0      # utd_IS_sigma_scale (free_space_diffraction.cpp:20)
TWO_PI = 2.0 * math.pi


@struct.dataclass
class FsdAperture:
    """K wedge-edge slots per lane (all (N, K, ...))."""
    v: jnp.ndarray        # (N, K, 3) clipped segment midpoint
    half_l: jnp.ndarray   # (N, K)
    nff: jnp.ndarray      # (N, K, 3) front-face normal (toward light)
    tff: jnp.ndarray      # (N, K, 3) front-face tangent
    nbf: jnp.ndarray      # (N, K, 3) back-face normal
    alpha: jnp.ndarray    # (N, K)
    edge_idx: jnp.ndarray  # (N, K) i32 row into the EdgeTable (−1 empty)
    valid: jnp.ndarray    # (N, K) bool
    w: jnp.ndarray        # (N, K) boundary window — ramps an edge's
    #                       contribution to 0 as it exits the envelope,
    #                       so set-membership flips are continuous

    @property
    def e(self):
        """Edge direction = nff × tff (reference fsd/common.hpp:65)."""
        return jnp.cross(self.nff, self.tff)

    @property
    def K(self):
        return self.v.shape[1]

    def any_valid(self):
        return jnp.any(self.valid, axis=1)

    def count(self):
        return jnp.sum(self.valid, axis=1)


def build_aperture(edges: EdgeTable, idx, wp, wi, region_radius
                   ) -> FsdAperture:
    """Build per-lane apertures from ball-queried edge rows.

    idx (N, K) i32 (−1 padding); wp (N, 3) interaction centre; wi (N, 3)
    direction toward the light/source side; region_radius (N,) clip radius
    (the reference clips against the interaction ellipsoid,
    free_space_diffraction.cpp:50-61 — here the bounding ball).
    """
    N, K = idx.shape
    i = jnp.maximum(idx, 0)
    row = edges.pack[i]          # ONE packed gather (layout: EdgeTable)
    n1 = row[..., 6:9]
    n2 = row[..., 9:12]
    t1 = row[..., 12:15]
    t2 = row[..., 15:18]
    wi_e = wi[:, None, :]

    f1_front = jnp.sum(wi_e * n1, axis=-1) > 0.0
    nff = jnp.where(f1_front[..., None], n1, n2)
    tff = jnp.where(f1_front[..., None], t1, t2)
    nbf = jnp.where(f1_front[..., None], n2, n1)
    # light from inside the wedge → skip (fsd ctor :44-45)
    ok = jnp.sum(wi_e * nff, axis=-1) > 0.0

    # clip segment to ball(wp, region_radius)
    p0 = row[..., 0:3]
    e_dir = row[..., 3:6]
    L = row[..., 19]
    wv = wp[:, None, :] - p0
    tproj = jnp.sum(wv * e_dir, axis=-1)
    d2 = jnp.sum(wv * wv, axis=-1) - tproj ** 2
    r = jnp.maximum(region_radius[:, None], 1e-20)
    r2 = r ** 2
    span = vec.safe_sqrt(r2 - d2, 1e-30)
    tlo = jnp.clip(tproj - span, 0.0, L)
    thi = jnp.clip(tproj + span, 0.0, L)
    ok &= (thi - tlo) > 1e-9
    v = p0 + (0.5 * (tlo + thi))[..., None] * e_dir
    half_l = 0.5 * (thi - tlo)

    ok &= idx >= 0
    # boundary window: the UTD wedge coefficient is O(1) however little
    # of the edge the envelope actually grazes, so set membership used
    # to be a step — 1-ulp rounding shifts under different XLA fusions
    # flipped near-tie classifications at ~3% of lanes with O(1) output
    # changes (tests/test_gradients_wave.py round-3/4 investigation).
    # Ramp the contribution to 0 continuously over the outer 2% of the
    # envelope radius and the first 1%·r of clipped length instead —
    # the flip boundary now carries zero weight (the reference offsets
    # tolerances instead, cone_intersection_tolerance.hpp; a continuous
    # window is the array-land equivalent with a stability guarantee).
    d = vec.safe_sqrt(jnp.maximum(d2, 0.0), 0.0)
    w_env = jnp.clip((1.0 - d / r) / 0.02, 0.0, 1.0)
    w_len = jnp.clip((thi - tlo) / (0.01 * r), 0.0, 1.0)
    win = jnp.where(ok, w_env * w_len, 0.0)
    return FsdAperture(v=v, half_l=half_l, nff=nff, tff=tff, nbf=nbf,
                       alpha=row[..., 18], edge_idx=idx, valid=ok,
                       w=win)


def aperture_face_tris(edges: EdgeTable, ap: FsdAperture):
    """The two triangles adjacent to each aperture edge ((N, K) i32 each,
    −1 for empty slots/boundary edges). Shadow legs that START or END on
    an edge's Fermat point graze both faces; excluding them from the
    occlusion trace makes the per-edge visibility classification robust
    to float rounding (the reference offsets ray origins off the wedge,
    intersection.hpp offseted_ray_origin — an exclusion is the exact
    array-land equivalent)."""
    i = jnp.maximum(ap.edge_idx, 0)
    t1 = jnp.where(ap.valid, edges.tri1[i], -1)
    t2 = jnp.where(ap.valid, edges.tri2[i], -1)
    return t1, t2


def empty_aperture(N: int, K: int) -> FsdAperture:
    z3 = jnp.zeros((N, K, 3), jnp.float32)
    z = jnp.zeros((N, K), jnp.float32)
    return FsdAperture(v=z3, half_l=z, nff=z3, tff=z3, nbf=z3, alpha=z,
                       edge_idx=jnp.full((N, K), -1, jnp.int32),
                       valid=jnp.zeros((N, K), bool), w=z)


def fsd_eval(ap: FsdAperture, k, src, dst):
    """Per-edge UTD evaluation for the connection src → dst
    (free_space_diffraction.cpp f(), :195-235).

    Returns dict of (N, K) arrays: Ds, Dh (complex), p (N,K,3), ri, ro,
    valid.
    """
    e = ap.e
    src_e = src[:, None, :]
    dst_e = dst[:, None, :]
    p, pvalid = utd.fermat_point_to(ap.v, e, ap.tff, ap.nff, ap.half_l,
                                    src_e, dst_e)
    ui = src_e - p
    uo = dst_e - p
    ri = vec.safe_length(ui)
    ro = vec.safe_length(uo)
    wi = ui / jnp.maximum(ri, 1e-20)[..., None]
    wo = uo / jnp.maximum(ro, 1e-20)[..., None]   # p → dst
    # ignore rays into the wedge. The strict sign test flips at machine
    # epsilon when src/dst lie exactly IN a wedge face's plane (common:
    # restarted lanes sit in the plane of their own aperture edges) —
    # a grazing-band RAMP was tried against those cross-lowering flips
    # (round-5) and REVERTED: cos→0 is the UTD shadow-boundary region
    # where the diffracted field legitimately carries O(1) energy (it
    # compensates the geometric-optics discontinuity), and zeroing it
    # dimmed the veach plt_path render enough to break bdpt/path
    # agreement (ratio 1.01 → 1.56). The residual flip noise is covered
    # by the fusion-lottery bound in tests/test_gradients_wave.py.
    side_i = (jnp.sum(wi * ap.nff, axis=-1) > 0) \
        | (jnp.sum(wi * ap.nbf, axis=-1) > 0)
    side_o = (jnp.sum(wo * ap.nff, axis=-1) > 0) \
        | (jnp.sum(wo * ap.nbf, axis=-1) > 0)
    Ds, Dh = utd.utd_coefficients(k[:, None], wi, wo, ro, e, ap.tff,
                                  ap.nff, ap.alpha)
    valid = ap.valid & pvalid & side_i & side_o
    # envelope-boundary window (see build_aperture): contributions ramp
    # to zero at the envelope edge so membership flips stay continuous
    Ds = jnp.where(valid, Ds * ap.w.astype(Ds.dtype), 0.0)
    Dh = jnp.where(valid, Dh * ap.w.astype(Dh.dtype), 0.0)
    return dict(Ds=Ds, Dh=Dh, p=p, ri=ri, ro=ro, valid=valid, wi=wi, wo=wo)


def coherent_sum(ev, k, src, dst, direct_visible, edge_unshadowed=None):
    """Σ_edges e^{-ik·d}·D + direct term (plt_path_detail.hpp do_fsd,
    :311-346). Phases are computed relative to the direct path length so
    the f32 arguments stay small. Returns (ts, th) complex (N,)."""
    d_ref = vec.safe_length(dst - src)
    d_e = ev["ri"] + ev["ro"]
    dphase = (d_e - d_ref[:, None]) * k[:, None]
    ok = ev["valid"]
    if edge_unshadowed is not None:
        ok = ok & edge_unshadowed
    phase = jnp.exp(-1j * dphase.astype(jnp.complex64))
    phase = jnp.where(ok, phase, 0.0)
    ts = jnp.sum(phase * ev["Ds"], axis=1)
    th = jnp.sum(phase * ev["Dh"], axis=1)
    one = jnp.asarray(1.0 + 0.0j, jnp.complex64)
    ts = ts + jnp.where(direct_visible, one, 0.0)
    th = th + jnp.where(direct_visible, one, 0.0)
    return ts, th


def fsd_intensity(ts, th):
    """Unpolarized FSD intensity factor (|ts|² + |th|²)/2
    (plt_path_detail.hpp:601)."""
    return 0.5 * (jnp.abs(ts) ** 2 + jnp.abs(th) ** 2)


def fsd_sample(ap: FsdAperture, k, src, wp, u4):
    """Sample an outgoing diffracted direction or the direct term
    (free_space_diffraction.cpp sample(), :84-152).

    src: previous vertex; wp: interaction centre. u4 (N, 4) uniforms
    (edge pick, point-on-edge, branch pick, gaussian via inverse-normal).
    Returns dict: wo (N,3), p (N,3) diffraction point, is_direct (N,),
    pdf (N,), valid (N,).
    """
    N, K = ap.valid.shape
    cnt = ap.count()
    total = cnt + 1                           # + direct term
    pick = jnp.floor(u4[:, 0] * total.astype(jnp.float32)).astype(jnp.int32)
    pick = jnp.clip(pick, 0, K)
    is_direct = pick >= cnt

    # map pick to the pick-th VALID slot
    order = jnp.cumsum(ap.valid.astype(jnp.int32), axis=1) - 1
    slot_match = (order == pick[:, None]) & ap.valid
    slot = jnp.argmax(slot_match, axis=1)
    rows = jnp.arange(N)

    v = ap.v[rows, slot]
    e = ap.e[rows, slot]
    nff = ap.nff[rows, slot]
    tff = ap.tff[rows, slot]
    nbf = ap.nbf[rows, slot]
    hl = ap.half_l[rows, slot]

    p = v + ((u4[:, 1] - 0.5) * 2.0 * hl)[:, None] * e
    ui = src - p
    okside = (vec.dot(ui, nff) > 0) | (vec.dot(ui, nbf) > 0)
    ri = vec.safe_length(ui)
    wi = ui / jnp.maximum(ri, 1e-20)[:, None]

    phii = jnp.arctan2(vec.dot(nff, wi), vec.dot(tff, wi))
    sigma = jnp.sqrt(SIGMA_SCALE / jnp.maximum(k * ri, 1e-9))
    # gaussian draw via inverse CDF of u4[:,3]
    gauss = jnp.sqrt(2.0) * jax.scipy.special.erfinv(
        jnp.clip(2.0 * u4[:, 3] - 1.0, -0.999999, 0.999999))
    mean_phi = jnp.where(u4[:, 2] < 0.5, math.pi + phii, math.pi - phii)
    phio = mean_phi + sigma * gauss

    cos_beta = vec.dot(wi, e)
    sin_beta = vec.safe_sqrt(1.0 - cos_beta ** 2, 1e-24)
    wo = (sin_beta * jnp.cos(phio))[:, None] * tff \
        + (sin_beta * jnp.sin(phio))[:, None] * nff \
        - cos_beta[:, None] * e
    ok = okside & (sin_beta >= utd.UTD_MIN_SIN_BETA) \
        & ((vec.dot(wo, nff) > 0) | (vec.dot(wo, nbf) > 0))

    pdf = fsd_pdf(ap, k, src, wo)
    ok &= pdf > 0

    # direct branch
    wo_direct = vec.normalize(wp - src, eps=1e-24)
    pdf_direct = 1.0 / total.astype(jnp.float32)
    wo = jnp.where(is_direct[:, None], wo_direct, wo)
    p = jnp.where(is_direct[:, None], wp, p)
    pdf = jnp.where(is_direct, pdf_direct, pdf)
    valid = jnp.where(is_direct, total > 0, ok)
    return dict(wo=wo, p=p, is_direct=is_direct, pdf=pdf, valid=valid)


def fsd_pdf(ap: FsdAperture, k, src, wo):
    """Solid-angle-ish density of fsd_sample for direction wo
    (free_space_diffraction.cpp pdf(), :154-193)."""
    e = ap.e
    src_e = src[:, None, :]
    wo_e = wo[:, None, :]
    p, pvalid = utd.fermat_point_dir(ap.v, e, ap.tff, ap.nff, ap.half_l,
                                     src_e, wo_e)
    ui = src_e - p
    side = ((jnp.sum(wo_e * ap.nff, axis=-1) > 0)
            | (jnp.sum(wo_e * ap.nbf, axis=-1) > 0)) \
        & ((jnp.sum(ui * ap.nff, axis=-1) > 0)
           | (jnp.sum(ui * ap.nbf, axis=-1) > 0))
    ri = vec.safe_length(ui)
    wi = ui / jnp.maximum(ri, 1e-20)[..., None]
    phii = jnp.arctan2(jnp.sum(ap.nff * wi, axis=-1),
                       jnp.sum(ap.tff * wi, axis=-1))
    phio = jnp.arctan2(jnp.sum(ap.nff * wo_e, axis=-1),
                       jnp.sum(ap.tff * wo_e, axis=-1))
    sigma = jnp.sqrt(SIGMA_SCALE / jnp.maximum(k[:, None] * ri, 1e-9))

    def wrap(x):
        y = jnp.mod(jnp.abs(x), TWO_PI)
        return jnp.where(y > math.pi, y - TWO_PI, y)

    x1 = wrap(phio - (math.pi + phii))
    x2 = wrap(phio - (math.pi - phii))
    apd = (1.0 / math.sqrt(TWO_PI)) / sigma * 0.5 * (
        jnp.exp(-0.5 * (x1 / sigma) ** 2)
        + jnp.exp(-0.5 * (x2 / sigma) ** 2))
    ok = ap.valid & pvalid & side
    total = ap.count().astype(jnp.float32) + 1.0
    return jnp.sum(jnp.where(ok, apd, 0.0), axis=1) / total
