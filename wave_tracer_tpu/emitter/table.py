"""Device emitter table: NEE sampling, emission evaluation, pdfs.

Batched equivalents of the reference emitter interface
(reference include/wt/emitter/emitter.hpp:37-179: sample, sample_direct,
pdf_direct, emission) over a flat SoA table. Area emitters carry per-triangle
area CDFs (concatenated across emitters) for position sampling, mirroring
shape_t's triangle-area distribution (reference include/wt/scene/shape.hpp:40-90).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from wave_tracer_tpu.math import vec
from wave_tracer_tpu.sampling import warps

ET_AREA = 0
ET_POINT = 1
ET_SPOT = 2
ET_DIRECTIONAL = 3

BIG = 1e30


@struct.dataclass
class EmitterTable:
    etype: jnp.ndarray       # (E,) i32
    pos: jnp.ndarray         # (E, 3)
    dir: jnp.ndarray         # (E, 3) propagation direction (spot/directional)
    cos_beam: jnp.ndarray    # (E,) cos(beam_width)
    cos_cutoff: jnp.ndarray  # (E,)
    beam_angle: jnp.ndarray  # (E,) beam_width [rad]
    cutoff_angle: jnp.ndarray  # (E,)
    spec_id: jnp.ndarray     # (E,) i32 baked spectrum row
    power: jnp.ndarray       # (E,) total power (selection weights)
    area_total: jnp.ndarray  # (E,) summed area (area emitters)
    tri_start: jnp.ndarray   # (E,) i32 into concatenated tri arrays
    tri_count: jnp.ndarray   # (E,) i32
    pse_scale: jnp.ndarray   # (E,) phase_space_extent_scale
    # concatenated per-emitter triangle data (device/BVH triangle order)
    etri_idx: jnp.ndarray    # (TT,) i32 triangle index in GeoArrays
    etri_cdf: jnp.ndarray    # (TT,) inclusive CDF normalized per emitter
    scene_radius: jnp.ndarray  # () bounding radius for directional emitters
    pack: jnp.ndarray        # (E, 20): etype pos3 dir3 cos_beam cos_cutoff
                             # beam_angle cutoff_angle spec_id power
                             # area_total tri_start tri_count pse_scale —
                             # one row gather per emitter access

    C_ETYPE = 0
    C_POS = slice(1, 4)
    C_DIR = slice(4, 7)
    C_COS_BEAM = 7
    C_COS_CUTOFF = 8
    C_BEAM_ANGLE = 9
    C_CUTOFF_ANGLE = 10
    C_SPEC = 11
    C_POWER = 12
    C_AREA = 13
    C_TRI_START = 14
    C_TRI_COUNT = 15
    C_PSE = 16

    @property
    def count(self):
        return self.etype.shape[0]


def bake_emitters(emitters, spec_ids, tri_emitter_id: np.ndarray,
                  tri_areas: np.ndarray,
                  scene_radius: float = 1.0) -> EmitterTable:
    """emitters: host model list; tri_* in device triangle order."""
    from wave_tracer_tpu.emitter import model
    E = max(len(emitters), 1)
    etype = np.zeros(E, np.int32)
    pos = np.zeros((E, 3), np.float32)
    edir = np.tile(np.array([0, 0, 1], np.float32), (E, 1))
    cosb = np.ones(E, np.float32)
    cosc = np.ones(E, np.float32)
    ba = np.zeros(E, np.float32)
    ca = np.zeros(E, np.float32)
    spec = np.full(E, -1, np.int32)
    power = np.zeros(E, np.float32)
    atot = np.zeros(E, np.float32)
    ts = np.zeros(E, np.int32)
    tc = np.zeros(E, np.int32)
    pse = np.ones(E, np.float32)

    idx_list, cdf_list = [], []
    off = 0
    for i, em in enumerate(emitters):
        spec[i] = spec_ids[id(em.spectrum)]
        pse[i] = em.phase_space_extent_scale
        if isinstance(em, model.AreaEmitter):
            etype[i] = ET_AREA
            mine = np.nonzero(tri_emitter_id == i)[0]
            areas = tri_areas[mine]
            total = float(areas.sum())
            atot[i] = total
            ts[i] = off
            tc[i] = len(mine)
            cdf = np.cumsum(areas) / max(total, 1e-30)
            idx_list.append(mine.astype(np.int32))
            cdf_list.append(cdf.astype(np.float32))
            off += len(mine)
            em.area = total
        elif isinstance(em, model.PointEmitter):
            etype[i] = ET_POINT
            pos[i] = em.position
        elif isinstance(em, model.SpotEmitter):
            etype[i] = ET_SPOT
            pos[i] = em.position
            edir[i] = em.direction
            cosb[i] = np.cos(em.beam_width)
            cosc[i] = np.cos(em.cutoff)
            ba[i] = em.beam_width
            ca[i] = em.cutoff
        elif isinstance(em, model.DirectionalEmitter):
            etype[i] = ET_DIRECTIONAL
            edir[i] = em.direction
            em.scene_radius = scene_radius
        power[i] = em.power()

    etri_idx = np.concatenate(idx_list) if idx_list else np.zeros(1, np.int32)
    etri_cdf = np.concatenate(cdf_list) if cdf_list else np.ones(1, np.float32)
    pack = np.zeros((E, 20), np.float32)
    pack[:, 0] = etype
    pack[:, 1:4] = pos
    pack[:, 4:7] = edir
    pack[:, 7] = cosb
    pack[:, 8] = cosc
    pack[:, 9] = ba
    pack[:, 10] = ca
    pack[:, 11] = spec
    pack[:, 12] = power
    pack[:, 13] = atot
    pack[:, 14] = ts
    pack[:, 15] = tc
    pack[:, 16] = pse
    return EmitterTable(
        pack=jnp.asarray(pack),
        etype=jnp.asarray(etype), pos=jnp.asarray(pos), dir=jnp.asarray(edir),
        cos_beam=jnp.asarray(cosb), cos_cutoff=jnp.asarray(cosc),
        beam_angle=jnp.asarray(ba), cutoff_angle=jnp.asarray(ca),
        spec_id=jnp.asarray(spec), power=jnp.asarray(power),
        area_total=jnp.asarray(atot), tri_start=jnp.asarray(ts),
        tri_count=jnp.asarray(tc), pse_scale=jnp.asarray(pse),
        etri_idx=jnp.asarray(etri_idx), etri_cdf=jnp.asarray(etri_cdf),
        scene_radius=jnp.asarray(scene_radius, jnp.float32))


def _spot_falloff_row(row, local_cos):
    """Linear angular falloff (reference spot.hpp compute_falloff)."""
    cutoff = row[..., EmitterTable.C_CUTOFF_ANGLE]
    beam = row[..., EmitterTable.C_BEAM_ANGLE]
    theta = jnp.arccos(jnp.clip(local_cos, -1.0 + 1e-6, 1.0 - 1e-6))
    w = (cutoff - theta) / jnp.maximum(cutoff - beam, 1e-9)
    return jnp.clip(
        jnp.where(local_cos <= row[..., EmitterTable.C_COS_CUTOFF], 0.0,
                  jnp.where(local_cos >= row[..., EmitterTable.C_COS_BEAM],
                            1.0, w)), 0.0, 1.0)


def _sample_area_point(et: EmitterTable, geo, row, u3):
    """Uniform-area point on an area emitter: (y, n, pdf_area)."""
    start = row[..., EmitterTable.C_TRI_START].astype(jnp.int32)
    cnt = jnp.maximum(row[..., EmitterTable.C_TRI_COUNT].astype(jnp.int32),
                      1)
    # per-lane inverse-CDF over this emitter's triangle range: fixed-count
    # binary search over the concatenated CDF (trip count is static from
    # the table size — gathers are the dominant cost on this backend)
    steps = max(1, int(et.etri_cdf.shape[0] - 1).bit_length())
    lo = jnp.zeros_like(start)
    hi = cnt - 1
    target = u3[..., 0]
    for _ in range(steps):
        mid = (lo + hi) // 2
        cv = et.etri_cdf[start + mid]
        go_right = cv < target
        lo = jnp.where(go_right, jnp.minimum(mid + 1, hi), lo)
        hi = jnp.where(go_right, hi, mid)
    ti = et.etri_idx[start + lo]
    b = warps.uniform_triangle(u3[..., 1:3])
    trow = geo.tri_geom[ti]                       # ONE packed gather
    y = trow[..., 0:3] + b[..., 0:1] * trow[..., 3:6] \
        + b[..., 1:2] * trow[..., 6:9]
    n = geo.tri_attr[ti][..., 15:18]              # geometric normal
    pdf_area = 1.0 / jnp.maximum(row[..., EmitterTable.C_AREA], 1e-30)
    return y, n, pdf_area, ti


def sample_direct(et: EmitterTable, geo, spec_table, e, x, k, u3):
    """NEE toward emitter e from point x (emitter.hpp sample_direct).

    Returns dict: wo (unit, x→emitter), dist, Li (spectral radiance-like
    contribution already including 1/d² for delta emitters), pdf_sa
    (solid-angle density; 1 for delta lobes), delta_dir (bool),
    y (light point), ln (light normal), valid.
    """
    row = et.pack[e]                              # ONE packed gather
    spec_val = spec_table.eval(
        row[..., EmitterTable.C_SPEC].astype(jnp.int32), k)
    etype = row[..., EmitterTable.C_ETYPE].astype(jnp.int32)

    # area
    y_a, ln_a, pdf_area, tri_a = _sample_area_point(et, geo, row, u3)
    d_a = y_a - x
    dist2_a = jnp.maximum(vec.length2(d_a), 1e-20)
    dist_a = jnp.sqrt(dist2_a)
    wo_a = d_a / dist_a[..., None]
    cos_l = -vec.dot(wo_a, ln_a)
    front = cos_l > 1e-7
    pdf_sa_a = pdf_area * dist2_a / jnp.maximum(cos_l, 1e-7)
    Li_a = jnp.where(front, spec_val, 0.0)

    # point / spot (delta position): contribution I(k)/d² [× falloff]
    y_p = row[..., EmitterTable.C_POS]
    e_dir = row[..., EmitterTable.C_DIR]
    d_p = y_p - x
    dist2_p = jnp.maximum(vec.length2(d_p), 1e-20)
    dist_p = jnp.sqrt(dist2_p)
    wo_p = d_p / dist_p[..., None]
    local_cos = -vec.dot(wo_p, e_dir)   # angle from spot axis
    falloff = _spot_falloff_row(row, local_cos)
    Li_p = spec_val / dist2_p
    Li_s = Li_p * falloff

    # directional: delta direction toward −dir, occlusion to scene bound
    wo_d = -e_dir
    Li_d = spec_val
    dist_d = jnp.broadcast_to(4.0 * et.scene_radius, dist_p.shape)

    is_area = etype == ET_AREA
    is_point = etype == ET_POINT
    is_spot = etype == ET_SPOT

    wo = jnp.where(is_area[..., None], wo_a,
                   jnp.where((is_point | is_spot)[..., None], wo_p,
                             jnp.broadcast_to(wo_d, wo_a.shape)))
    dist = jnp.where(is_area, dist_a,
                     jnp.where(is_point | is_spot, dist_p, dist_d))
    Li = jnp.where(is_area, Li_a,
                   jnp.where(is_point, Li_p,
                             jnp.where(is_spot, Li_s, Li_d)))
    pdf_sa = jnp.where(is_area, pdf_sa_a, 1.0)
    delta = ~is_area
    valid = Li > 0.0
    y = jnp.where(is_area[..., None], y_a,
                  jnp.broadcast_to(y_p, y_a.shape))
    ln = jnp.where(is_area[..., None], ln_a, -wo)
    tri = jnp.where(is_area, tri_a, -1)
    return dict(wo=wo, dist=dist, Li=Li, pdf_sa=pdf_sa, delta_dir=delta,
                y=y, ln=ln, valid=valid, tri=tri)


def emission_radiance(et: EmitterTable, spec_table, emitter_id, k,
                      cos_out):
    """Le of an area emitter hit from the front (cos_out > 0)
    (reference area.cpp Le)."""
    eid = jnp.maximum(emitter_id, 0)
    val = spec_table.eval(et.spec_id[eid], k)
    return jnp.where((emitter_id >= 0) & (cos_out > 0), val, 0.0)


def pdf_direct_solid_angle(et: EmitterTable, emitter_id, dist2, cos_l):
    """Density that sample_direct would have produced this direction
    (for MIS with BSDF sampling); area emitters only."""
    eid = jnp.maximum(emitter_id, 0)
    pdf = dist2 / (jnp.maximum(cos_l, 1e-7)
                   * jnp.maximum(et.area_total[eid], 1e-30))
    return jnp.where((emitter_id >= 0) & (et.etype[eid] == ET_AREA)
                     & (cos_l > 1e-7), pdf, 0.0)


def sample_emission(et: EmitterTable, geo, spec_table, e, k, u4):
    """Forward transport: sample an emitted ray (y, dir, Le-weight, pdfs)
    (emitter.hpp sample). Returns dict with position y, normal ln, direction
    wo (propagation), weight (spectral power density carried per unit pdf),
    pdf_area, pdf_dir, valid."""
    row = et.pack[e]                              # ONE packed gather
    spec_val = spec_table.eval(
        row[..., EmitterTable.C_SPEC].astype(jnp.int32), k)
    etype = row[..., EmitterTable.C_ETYPE].astype(jnp.int32)
    e_dir = row[..., EmitterTable.C_DIR]
    e_pos = row[..., EmitterTable.C_POS]

    # area: uniform position, cosine direction
    y_a, ln_a, pdf_area_a, _ = _sample_area_point(et, geo, row,
                                                  u4[..., :3])
    from wave_tracer_tpu.math import frame as frame_mod
    fr = frame_mod.build_orthogonal_frame(ln_a)
    wo_loc = warps.cosine_hemisphere(
        jnp.stack([u4[..., 3], u4[..., 0]], axis=-1))
    wo_area = fr.to_world(wo_loc)
    pdf_dir_a = warps.cosine_hemisphere_pdf(wo_loc[..., 2])

    # point: uniform sphere
    wo_pt = warps.uniform_sphere(u4[..., 0:2])
    # spot: uniform cone of cutoff angle
    sa_cut = 2.0 * jnp.pi * (1.0 - row[..., EmitterTable.C_COS_CUTOFF])
    wo_sp_loc = warps.uniform_cone(sa_cut, u4[..., 0:2])
    frs = frame_mod.build_orthogonal_frame(
        jnp.broadcast_to(e_dir, y_a.shape))
    wo_sp = frs.to_world(wo_sp_loc)
    falloff = _spot_falloff_row(row, wo_sp_loc[..., 2])

    # directional: disk at scene bound
    R = et.scene_radius
    disk = warps.concentric_disk(u4[..., 0:2]) * R
    frd = frame_mod.build_orthogonal_frame(
        jnp.broadcast_to(e_dir, y_a.shape))
    y_dir = -2.0 * R * frd.n + disk[..., 0:1] * frd.t \
        + disk[..., 1:2] * frd.b
    pdf_area_d = 1.0 / (jnp.pi * R * R)

    is_area = etype == ET_AREA
    is_point = etype == ET_POINT
    is_spot = etype == ET_SPOT
    is_dir = etype == ET_DIRECTIONAL

    y = jnp.where(is_area[..., None], y_a,
                  jnp.where(is_dir[..., None], y_dir,
                            jnp.broadcast_to(e_pos, y_a.shape)))
    wo = jnp.where(is_area[..., None], wo_area,
                   jnp.where(is_point[..., None], wo_pt,
                             jnp.where(is_spot[..., None], wo_sp,
                                       jnp.broadcast_to(e_dir,
                                                        y_a.shape))))
    ln = jnp.where(is_area[..., None], ln_a,
                   jnp.where(is_dir[..., None],
                             jnp.broadcast_to(frd.n, y_a.shape), wo))
    pdf_area = jnp.where(is_area, pdf_area_a,
                         jnp.where(is_dir, pdf_area_d, 1.0))
    pdf_dir = jnp.where(is_area, pdf_dir_a,
                        jnp.where(is_point, warps.uniform_sphere_pdf(),
                                  jnp.where(is_spot, 1.0 / sa_cut, 1.0)))
    # emitted differential power per (area × solid angle × wavenumber):
    # area: L·cosθ; point/spot: I (per sr); directional: E (per area)
    cos_e = jnp.abs(vec.dot(wo, ln))
    Le = jnp.where(is_area, spec_val * cos_e,
                   jnp.where(is_point, spec_val,
                             jnp.where(is_spot, spec_val * falloff,
                                       spec_val)))
    weight = Le / jnp.maximum(pdf_area * pdf_dir, 1e-30)
    return dict(y=y, ln=ln, wo=wo, weight=weight, pdf_area=pdf_area,
                pdf_dir=pdf_dir, valid=weight > 0)


def pdf_emission_dir(et: EmitterTable, emitter_id, ln, wo):
    """Directional density of sample_emission at an emitter vertex
    (solid-angle measure): area = cosine hemisphere, point = uniform
    sphere, spot = uniform cone, directional = delta (0). Mirrors the
    pdf_dir terms of sample_emission (reference emitter pdfs,
    include/wt/emitter/emitter.hpp)."""
    eid = jnp.maximum(emitter_id, 0)
    etype = et.etype[eid]
    cos_e = vec.dot(ln, wo)
    pdf_area_dir = jnp.maximum(cos_e, 0.0) / jnp.pi
    sa_cut = 2.0 * jnp.pi * (1.0 - et.cos_cutoff[eid])
    e_dir = et.dir[eid]
    in_cone = vec.dot(e_dir, wo) >= et.cos_cutoff[eid]
    pdf = jnp.where(etype == ET_AREA, pdf_area_dir,
                    jnp.where(etype == ET_POINT,
                              1.0 / (4.0 * jnp.pi),
                              jnp.where((etype == ET_SPOT) & in_cone,
                                        1.0 / jnp.maximum(sa_cut, 1e-9),
                                        0.0)))
    return jnp.where(emitter_id >= 0, pdf, 0.0)
