"""Backward unidirectional path integrator — wavefront over beam lanes.

TPU-first re-design of the reference's plt_path backward walk
(reference include/wt/integrator/plt_path/plt_path_detail.hpp:543-801):
the recursive random_walk becomes a bounded `lax.fori_loop` over a SoA lane
state; every lane carries a full Mueller throughput operator (the
reference's backward beam, beam.hpp:31-248), spectral path state (one
sampled wavenumber per lane) and MIS bookkeeping. All control flow is
masked lane arithmetic — no data-dependent branching under jit.

Pipeline per lane: spectral sample (emitter×sensitivity product) → camera
importance ray → [trace → emission MIS → NEE (power-heuristic MIS) → BSDF
sample → russian roulette]^depth → response-weighted film splat.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wave_tracer_tpu.accel import trace as trace_mod
from wave_tracer_tpu.bsdf import device as bsdf_dev
from wave_tracer_tpu.emitter import table as etab
from wave_tracer_tpu.math import frame as frame_mod
from wave_tracer_tpu.math import vec
from wave_tracer_tpu.polarization import stokes
from wave_tracer_tpu.sampling import rng

BIG = 1e30


def _power_heuristic(a, b):
    a2 = a * a
    return a2 / jnp.maximum(a2 + b * b, 1e-30)


def _perp_axis(d):
    """Any unit vector ⊥ d (for degenerate scattering planes)."""
    from wave_tracer_tpu.math import frame as _f
    return _f.build_orthogonal_frame(d).t


def compose_scatter(M_old, x_old, d_out, M_b, d_in):
    """Frame-aware Mueller composition at a scatter vertex.

    The BSDF operator M_b is expressed in the S/P basis of the scattering
    plane (spanned by the incoming light propagation d_in and outgoing
    d_out, both world-space unit vectors; light flows d_in → d_out toward
    the sensor). M_old expects its input Stokes with transverse x-axis
    x_old ⊥ d_out. Returns (M_new, x_new): the composed operator and its
    input frame axis (⊥ d_in). Mirrors the reference's frame-aware Mueller
    application (reference include/wt/interaction/polarimetric/
    mueller.hpp M(S, frames...)).
    """
    from wave_tracer_tpu.polarization import mueller
    s_axis = jnp.cross(d_in, d_out)
    slen = jnp.linalg.norm(s_axis, axis=-1, keepdims=True)
    degen = slen[..., 0] < 1e-7
    s_axis = jnp.where(degen[..., None], _perp_axis(d_out),
                       s_axis / jnp.maximum(slen, 1e-12))
    theta = stokes.rotation_angle(s_axis, x_old, d_out)
    R = mueller.rotation(theta)
    M_new = jnp.einsum("nij,njk,nkl->nil", M_old, R, M_b)
    return M_new, s_axis


# device-counter layout (reference ads_stats.hpp / integrator/stats.hpp
# equivalents, carried in the wavefront state per SURVEY §5.1)
STAT_RAYS = 0          # primary/bounce traces issued
STAT_SHADOW = 1        # shadow rays issued
STAT_SURFACE = 2       # surface interactions
STAT_FSD = 3           # free-space-diffraction interactions
STAT_NULL = 4          # null interactions (region restarts)
STAT_RR_KILL = 5       # lanes terminated by russian roulette
STAT_DEPTH_SUM = 6     # Σ completed path depths (mean = /paths)
STAT_EDGE_HIT = 7      # lanes whose envelope swept ≥1 edge
STAT_BALLISTIC = 8     # hybrid traversal: ballistic interactions
STAT_DIFFUSIVE = 9     # hybrid traversal: diffusive (cone) interactions
STAT_TRI_TESTS = 10    # ray-triangle pair tests issued (the MXU/brute
                       # all-pairs equivalent of ads_stats' nodes-
                       # visited/AABB-test counters, ads_stats.hpp:63)
STAT_CONE_TESTS = 11   # exact cone-triangle tests issued
STAT_TRI_HIST0 = 12    # tris-per-cone log2 histogram, 8 bins
N_TRI_HIST = 8         # bins: 0, 1, 2, 3-4, 5-8, 9-16, 17-32, 33+
N_STATS = STAT_TRI_HIST0 + N_TRI_HIST


def tri_hist_bin(count):
    """Log2 bin index of a tris-per-cone count (reference
    ads_stats.hpp:78-86 tris-per-cone histogram)."""
    c = jnp.maximum(count, 0)
    return jnp.minimum(
        jnp.where(c == 0, 0,
                  1 + jnp.ceil(jnp.log2(jnp.maximum(
                      c.astype(jnp.float32), 1.0))).astype(jnp.int32)),
        N_TRI_HIST - 1)


def trace_paths(data, pixel_xy, jitter, base_key, sample_ids, *,
                sensor, max_depth: int = 8, rr_depth: int = 3,
                rr_floor: float = 0.5, eps: float = 1e-5,
                mis: bool = True, with_stats: bool = False,
                debug_buckets: bool = False):
    """Trace one batch of backward paths.

    data: SceneData. pixel_xy (N, 2) i32; jitter (N, 2); sample_ids (N,).
    Returns (pos (N,2) splat positions, values (N,C), valid (N,));
    with_stats appends an (N_STATS,) f32 device-counter vector.
    """
    geo = data.geo
    tables = data.tables
    et = data.emitters
    sp = data.spectral
    N = pixel_xy.shape[0]

    pixel_id = pixel_xy[:, 1] * sensor.width + pixel_xy[:, 0]
    keys = rng.sample_key(base_key, pixel_id, sample_ids)

    # --- spectral sampling: (emitter, k) ~ products; weight = 1/marginal
    u_spec = rng.uniform(keys, rng.D_SPECTRUM, 2)
    e0, _ = sp.sample_emitter(u_spec[:, 0])
    k, _ = sp.sample_k(e0, u_spec[:, 1])
    p_k = sp.joint_spectral_density(k)
    w_spectral = 1.0 / jnp.maximum(p_k, 1e-30)

    # --- camera ray
    ro, rd, _tan_alpha = sensor.generate_rays(pixel_xy, jitter)
    splat_pos = pixel_xy.astype(jnp.float32) + jitter

    M0 = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (N, 4, 4)) \
        * sensor.importance()

    polarimetric = bool(getattr(sensor, "polarimetric", False))
    state = dict(
        ro=ro, rd=rd,
        M=M0,
        xf=_perp_axis(-rd),    # transverse x-axis of M's input frame
        L=jnp.zeros((N, 4), jnp.float32),   # Stokes accumulation
        active=jnp.ones((N,), bool),
        exclude=jnp.full((N,), -1, jnp.int32),
        prev_pdf=jnp.zeros((N,), jnp.float32),
        prev_specular=jnp.ones((N,), bool),   # depth 0 counts as specular
        stats=jnp.zeros((N_STATS,), jnp.float32),
    )
    if debug_buckets:
        # intensity sums per (depth, {emission, nee}) for estimator
        # cross-audits — carried ONLY when asked: the two per-bounce
        # scatter-adds cost ~2 ms/bounce on the axon backend and were
        # measured eating ~5% of classical throughput when unconditional
        state["dbg"] = jnp.zeros((max_depth, 2), jnp.float32)

    def contribution(M, Li):
        """Stokes vector reaching the sensor for unpolarized light Li."""
        S = stokes.unpolarized(Li)
        return jnp.einsum("nij,nj->ni", M, S)

    def body(depth, st):
        dkeys = rng.depth_key(keys, depth)
        return classical_bounce(data, st, dkeys, k, depth, eps=eps,
                                mis=mis, rr_depth=rr_depth,
                                rr_floor=rr_floor, with_stats=with_stats)

    state = jax.lax.fori_loop(0, max_depth, body, state)

    # response-weighted channel values; polarimetric sensors get all four
    # Stokes components per channel (C*4 film channels, I/Q/U/V order)
    sens = sensor.response.sensitivities(k, tables.spectra, None)
    Lw = state["L"] * w_spectral[:, None]
    if polarimetric:
        values = (Lw[:, None, :] * sens[..., None]).reshape(N, -1)
    else:
        values = Lw[:, 0:1] * sens
    if debug_buckets:
        return splat_pos, values, jnp.ones((N,), bool), state["dbg"]
    if with_stats:
        return splat_pos, values, jnp.ones((N,), bool), state["stats"]
    return splat_pos, values, jnp.ones((N,), bool)


def classical_bounce(data, st, dkeys, k, depth, *, eps, mis, rr_depth,
                     rr_floor, with_stats=False):
    """One classical bounce over the lane state (trace → emission MIS →
    NEE → BSDF sample → RR). Shared by the batched fori_loop renderer
    (trace_paths) and the compacted persistent wavefront
    (path_compact.py); `depth` may be a scalar or a per-lane vector —
    identical RNG streams either way."""
    geo = data.geo
    tables = data.tables
    et = data.emitters
    N = st["L"].shape[0]

    def contribution(M, Li):
        S = stokes.unpolarized(Li)
        return jnp.einsum("nij,nj->ni", M, S)

    t, tri, u, v = trace_mod.trace(geo, st["ro"], st["rd"],
                                   jnp.full((N,), eps),
                                   jnp.full((N,), BIG), st["exclude"])
    hit = trace_mod.hit_attributes(geo, st["ro"], st["rd"], t, tri, u, v)
    lane = st["active"] & hit.valid

    # shading frame
    sf = frame_mod.build_shading_frame(hit.ns, hit.dpdu)
    sf = bsdf_dev.apply_normalmap(tables, hit.mat_id, hit.uv, k, sf)
    wi = -st["rd"]
    wi_l = sf.to_local(wi)

    # --- emission (hit an area emitter from the front)
    cos_out = vec.dot(wi, hit.geo_n)
    Le = etab.emission_radiance(et, tables.spectra, hit.emitter_id, k,
                                cos_out)
    d2 = jnp.maximum(hit.t, 1e-9) ** 2
    pdf_nee_same = etab.pdf_direct_solid_angle(
        et, hit.emitter_id, d2, cos_out) \
        * _emitter_pmf(et, hit.emitter_id)
    w_mis_e = jnp.where(st["prev_specular"] | (~jnp.asarray(mis)),
                        1.0,
                        _power_heuristic(st["prev_pdf"], pdf_nee_same))
    dL_e = jnp.where((lane & (Le > 0))[:, None],
                     w_mis_e[..., None] * contribution(st["M"], Le),
                     0.0)
    L = st["L"] + dL_e
    dbg = st.get("dbg")
    if dbg is not None:
        D_dbg = dbg.shape[0]
        if jnp.ndim(depth) == 0:
            dbg = dbg.at[depth, 0].add(dL_e[:, 0].sum())
        else:
            dbg = dbg.at[jnp.minimum(depth, D_dbg - 1), 0].add(
                dL_e[:, 0])

    # --- NEE
    u_pick = rng.uniform(dkeys, rng.D_EMITTER_PICK)
    e_n, pmf_n = _sample_emitter_by_power(et, u_pick)
    u_nee = rng.uniform(dkeys, rng.D_NEE, 3)
    nee = etab.sample_direct(et, geo, tables.spectra, e_n, hit.p, k,
                             u_nee)
    wo_nee_l = sf.to_local(nee["wo"])
    f_nee, pdf_b_nee = bsdf_dev.eval_f(tables, hit.mat_id, wi_l,
                                       wo_nee_l, hit.uv, k)
    occ = trace_mod.occluded(geo, hit.p, nee["wo"],
                             jnp.full((N,), eps),
                             nee["dist"] - 2.0 * eps,
                             hit.tri, nee["tri"])
    pdf_nee = pmf_n * nee["pdf_sa"]
    w_mis_n = jnp.where(nee["delta_dir"] | (~jnp.asarray(mis)), 1.0,
                        _power_heuristic(pdf_nee, pdf_b_nee))
    M_nee, _ = compose_scatter(st["M"], st["xf"], -st["rd"], f_nee,
                               -nee["wo"])
    c_nee = contribution(M_nee, nee["Li"]) \
        / jnp.maximum(pdf_nee, 1e-30)[:, None]
    ok_nee = lane & nee["valid"] & (~occ) & (pdf_nee > 0) \
        & (f_nee[:, 0, 0] > 0)
    dL_n = jnp.where(ok_nee[:, None],
                     jnp.asarray(w_mis_n)[..., None] * c_nee, 0.0)
    L = L + dL_n
    if dbg is not None:
        if jnp.ndim(depth) == 0:
            dbg = dbg.at[depth, 1].add(dL_n[:, 0].sum())
        else:
            dbg = dbg.at[jnp.minimum(depth, D_dbg - 1), 1].add(
                dL_n[:, 0])

    # --- BSDF sampling / continuation
    u_b = jnp.concatenate([
        rng.uniform(dkeys, rng.D_BSDF_LOBE, 2),
        rng.uniform(dkeys, rng.D_BSDF_DIR, 2)], axis=-1)
    bs = bsdf_dev.sample(tables, hit.mat_id, wi_l, hit.uv, k, u_b)
    wo_w = sf.to_world(bs.wo)
    M_next, xf_next = compose_scatter(st["M"], st["xf"], -st["rd"],
                                      bs.Mw, -wo_w)

    # --- russian roulette (plt_path_detail.hpp:123-142: floor .5)
    u_rr = rng.uniform(dkeys, rng.D_RR)
    beta = jnp.abs(M_next[:, 0, 0])
    q = jnp.clip(beta, rr_floor, 1.0)
    do_rr = depth >= rr_depth
    survive = jnp.where(do_rr, u_rr < q, True)
    M_next = M_next / jnp.where(do_rr, q, 1.0)[:, None, None]

    active = lane & bs.valid & survive & (beta > 1e-9)
    stats = st["stats"]
    if with_stats:
        f32 = jnp.float32
        stats = stats.at[STAT_RAYS].add(st["active"].sum(dtype=f32))
        stats = stats.at[STAT_SHADOW].add(lane.sum(dtype=f32))
        stats = stats.at[STAT_SURFACE].add(lane.sum(dtype=f32))
        stats = stats.at[STAT_RR_KILL].add(
            (lane & bs.valid & ~survive).sum(dtype=f32))
        stats = stats.at[STAT_DEPTH_SUM].add(active.sum(dtype=f32))
        # ray-tri pair tests: trace + NEE shadow, counted per the
        # backend actually selected (0 under the data-dependent BVH —
        # ads_stats.hpp:63 nodes-visited/AABB-test analogue)
        stats = stats.at[STAT_TRI_TESTS].add(
            2.0 * N * trace_mod.ray_tests_per_lane(data.geo))
    return dict(
        ro=jnp.where(active[:, None], hit.p, st["ro"]),
        rd=jnp.where(active[:, None], wo_w, st["rd"]),
        M=jnp.where(active[:, None, None], M_next, st["M"]),
        xf=jnp.where(active[:, None], xf_next, st["xf"]),
        L=L,
        active=active,
        exclude=jnp.where(active, hit.tri, st["exclude"]),
        prev_pdf=jnp.where(active, bs.pdf, st["prev_pdf"]),
        prev_specular=jnp.where(active, bs.specular,
                                st["prev_specular"]),
        stats=stats,
        **({} if dbg is None else {"dbg": dbg}),
    )


def _emitter_pmf(et, emitter_id):
    tot = jnp.maximum(et.power.sum(), 1e-30)
    eid = jnp.maximum(emitter_id, 0)
    return jnp.where(emitter_id >= 0, et.power[eid] / tot, 0.0)


def _sample_emitter_by_power(et, u):
    cdf = jnp.cumsum(et.power)
    tot = jnp.maximum(cdf[-1], 1e-30)
    e = jnp.clip(jnp.searchsorted(cdf / tot, u, side="right"), 0,
                 et.count - 1).astype(jnp.int32)
    return e, et.power[e] / tot
