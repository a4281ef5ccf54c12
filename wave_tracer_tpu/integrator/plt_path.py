"""plt_path — wave-optical backward transport, wavefront over beam lanes.

The TPU re-design of reference include/wt/integrator/plt_path/
plt_path_detail.hpp:543-801. Each lane carries a full beam: elliptic-cone
envelope (isotropic approximation of the cross-section for traversal),
Mueller throughput operator, spectral state (one wavenumber), and the
deferred free-space-diffraction carry — the previous vertex's aperture
plus the pre-interaction Mueller operator, superposed one bounce later
exactly as the reference's two-beam carry (plt_path_detail.hpp:591-610).

Per bounce: trace → sweep edges inside the beam envelope (ballistic edge
search, :657-660) → evaluate deferred coherent UTD sum (with per-edge
shadow tests) → emission MIS → NEE → interaction (surface | FSD | null) →
build the next deferred aperture → RR.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from wave_tracer_tpu.accel import edges as edges_mod
from wave_tracer_tpu.accel import trace as trace_mod
from wave_tracer_tpu.integrator import traversal as traversal_mod
from wave_tracer_tpu.bsdf import device as bsdf_dev
from wave_tracer_tpu.emitter import table as etab
from wave_tracer_tpu.integrator.path import (N_STATS, STAT_BALLISTIC,
                                             STAT_CONE_TESTS,
                                             STAT_DEPTH_SUM,
                                             STAT_DIFFUSIVE,
                                             STAT_EDGE_HIT, STAT_FSD,
                                             STAT_NULL, STAT_RAYS,
                                             STAT_RR_KILL, STAT_SHADOW,
                                             STAT_SURFACE, STAT_TRI_HIST0,
                                             STAT_TRI_TESTS,
                                             _emitter_pmf, _perp_axis,
                                             _power_heuristic,
                                             _sample_emitter_by_power,
                                             compose_scatter, tri_hist_bin)
from wave_tracer_tpu.math import frame as frame_mod
from wave_tracer_tpu.math import vec
from wave_tracer_tpu.polarization import stokes
from wave_tracer_tpu.sampling import rng
from wave_tracer_tpu.wave import beam as beam_geo
from wave_tracer_tpu.wave import envelope as env_mod
from wave_tracer_tpu.wave import fsd as fsd_mod
from wave_tracer_tpu.wave import sourcing

BIG = 1e30
# z-extent of the interaction region relative to the footprint major axis
# (reference beam_generic.hpp:50 footprint z = 2×major axis)
Z_SCALE = 2.0


def trace_paths_wave(data, pixel_xy, jitter, base_key, sample_ids, *,
                     sensor, edge_table, max_depth: int = 8,
                     rr_depth: int = 3, rr_floor: float = 0.5,
                     eps: float = 1e-5, mis: bool = True, fsd: bool = True,
                     K: int = 8, with_stats: bool = False):
    """Wave-mode path batch. Returns (splat_pos, values, valid)."""
    geo = data.geo
    tables = data.tables
    et = data.emitters
    sp = data.spectral
    N = pixel_xy.shape[0]

    pixel_id = pixel_xy[:, 1] * sensor.width + pixel_xy[:, 0]
    keys = rng.sample_key(base_key, pixel_id, sample_ids)

    u_spec = rng.uniform(keys, rng.D_SPECTRUM, 2)
    e0, _ = sp.sample_emitter(u_spec[:, 0])
    k, _ = sp.sample_k(e0, u_spec[:, 1])
    p_k = sp.joint_spectral_density(k)
    w_spectral = 1.0 / jnp.maximum(p_k, 1e-30)

    ro, rd, pixel_tan_alpha = sensor.generate_rays(pixel_xy, jitter)
    splat_pos = pixel_xy.astype(jnp.float32) + jitter

    M0 = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (N, 4, 4)) \
        * sensor.importance()

    polarimetric = bool(getattr(sensor, "polarimetric", False))
    state = dict(
        ro=ro, rd=rd, M=M0,
        xf=_perp_axis(-rd),
        L=jnp.zeros((N, 4), jnp.float32),
        active=jnp.ones((N,), bool),
        exclude=jnp.full((N,), -1, jnp.int32),
        prev_pdf=jnp.zeros((N,), jnp.float32),
        prev_specular=jnp.ones((N,), bool),
        # full elliptic beam envelope (reference beam.hpp elliptic cone);
        # the edge/tri set sweeps use the conservative major-axis radius
        env=env_mod.initial(rd, 0.0, 0.5 * pixel_tan_alpha),
        # deferred FSD carry
        fsd_ap=fsd_mod.empty_aperture(N, K),
        fsd_valid=jnp.zeros((N,), bool),
        sampled_fsd=jnp.zeros((N,), bool),
        prev_vert=ro,
        M_prev=M0,
        stats=jnp.zeros((N_STATS,), jnp.float32),
    )

    def contribution(M, Li):
        S = stokes.unpolarized(Li)
        return jnp.einsum("nij,nj->ni", M, S)

    def body(depth, st):
        dkeys = rng.depth_key(keys, depth)
        return wave_bounce(data, edge_table, st, dkeys, k, depth,
                           eps=eps, mis=mis, fsd=fsd, K=K,
                           rr_depth=rr_depth, rr_floor=rr_floor,
                           with_stats=with_stats)

    state = jax.lax.fori_loop(0, max_depth, body, state)

    sens = sensor.response.sensitivities(k, tables.spectra, None)
    Lw = state["L"] * w_spectral[:, None]
    if polarimetric:
        values = (Lw[:, None, :] * sens[..., None]).reshape(N, -1)
    else:
        values = Lw[:, 0:1] * sens
    if with_stats:
        return splat_pos, values, jnp.ones((N,), bool), state["stats"]
    return splat_pos, values, jnp.ones((N,), bool)


def wave_bounce(data, edge_table, st, dkeys, k, depth, *, eps, mis,
                fsd, K, rr_depth, rr_floor, with_stats=False):
    """One wave-optical bounce over the lane state (hybrid traversal →
    deferred coherent UTD → emission MIS → NEE → surface/FSD/null
    interaction → RR). Shared by the batched fori_loop renderer
    (trace_paths_wave) and the compacted persistent wavefront; `depth`
    may be scalar or per-lane."""
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
    hit = trace_mod.hit_attributes(geo, st["ro"], st["rd"], t, tri, u,
                                   v)
    lane = st["active"]
    hit_ok = lane & hit.valid

    env = st["env"]
    zmax = jnp.where(hit.valid, hit.t * 1.02 + env.x0,
                     8.0 * et.scene_radius)

    # ---- hybrid ballistic/diffusive traversal (reference
    # traversal.hpp:39-161 as a closed-form schedule over ONE exact
    # cone-triangle set sweep)
    tri_clusters = getattr(data, "tri_clusters", None)
    import os as _os
    q_mode = _os.environ.get("WT_CONE_QUERY", "")
    lam = (2.0 * math.pi) / jnp.maximum(k, 1e-9)
    T_geo = float(geo.num_tris)
    if q_mode == "2pass":
        # bounding-sphere pretest + exact test on top-J candidates
        # (reference enlarged-AABB cluster pretest, bvh8w.cpp:187-230)
        tidx, tz, tcnt = trace_mod.tris_near_cone_2pass(
            geo, st["ro"], st["rd"], env, zmax, K,
            exclude_tri=st["exclude"])
        tr = traversal_mod.schedule(hit.t, hit.valid, tz, env, lam,
                                    zmax)
        cone_tests_per_lane = 32.0      # exact tests on J=32 candidates
    elif q_mode == "clustered" and tri_clusters is not None:
        # two-level clustered sweep (sublinear; reference BVH cone walk
        # src/ads/bvh8w.cpp:233-318 equivalent; wins on CPU at scale,
        # gather-bound on the axon v5e)
        tidx, tz, tcnt = trace_mod.tris_near_cone_clustered(
            geo, tri_clusters, st["ro"], st["rd"], env, zmax, K,
            exclude_tri=st["exclude"])
        tr = traversal_mod.schedule(hit.t, hit.valid, tz, env, lam,
                                    zmax)
        cone_tests_per_lane = float(trace_mod.TRI_N_CLUSTERS
                                    * trace_mod.TRI_CAP)
    elif q_mode == "topk":
        tidx, tz, tcnt = trace_mod.tris_near_cone(
            geo, st["ro"], st["rd"], env, zmax, K,
            exclude_tri=st["exclude"])
        tr = traversal_mod.schedule(hit.t, hit.valid, tz, env, lam,
                                    zmax)
        cone_tests_per_lane = T_geo
    else:
        # default: the schedule consumes only per-boundary earliest
        # encounters — compute those directly with masked min-reduces
        # (no per-tile SORT; sees every encounter, not a K-capped set).
        # On TPU the sweep runs in the Pallas VMEM kernel
        # (accel/mxu_cone.py): one 16-feature matmul produces the local
        # vertex coords per (lane, tri) pair and the exact entry math
        # never touches HBM — the XLA version materialises (N, tile)
        # temporaries between fusion boundaries and is HBM-bound at
        # scale (VERDICT r4 item 6).
        bounds = traversal_mod.segment_boundaries(lam)
        use_mxu = (q_mode == "mxu"
                   or (q_mode == "" and trace_mod.platform_is_tpu()
                       and geo.num_tris <= trace_mod.MXU_MAX_TRIS))
        if use_mxu:
            from wave_tracer_tpu.accel import mxu_cone
            zc, tcnt = mxu_cone.cone_boundary_minz_mxu(
                geo, st["ro"], st["rd"], env, bounds, zmax,
                exclude_tri=st["exclude"],
                use_pallas=trace_mod.platform_is_tpu())
        else:
            zc, tcnt = trace_mod.cone_boundary_minz(
                geo, st["ro"], st["rd"], env, bounds, zmax,
                exclude_tri=st["exclude"])
        tr = traversal_mod.schedule_from_minz(hit.t, hit.valid, zc, env,
                                              lam, zmax)
        cone_tests_per_lane = T_geo     # dense min-reduce sweep

    # ---- edge sweep inside the beam envelope (FSD aperture feed)
    if fsd and edge_table.count > 0:
        if edge_table.count > 2048:
            eidx, ez, ecnt = edges_mod.edges_near_cone_clustered(
                edge_table, data.edge_clusters, st["ro"], st["rd"],
                env, zmax, K)
        else:
            eidx, ez, ecnt = edges_mod.edges_near_cone(
                edge_table, st["ro"], st["rd"], env, zmax, K)
    else:
        eidx = jnp.full((N, K), -1, jnp.int32)
        ez = jnp.full((N, K), jnp.inf)
        ecnt = jnp.zeros((N,), jnp.int32)
    have_edges = ecnt > 0

    # surface interaction: ballistic hits always; diffusive regions
    # when the central-ray hit falls inside the interaction region
    # (reference find_closest_triangle, plt_path_detail.hpp:616-652)
    delta = traversal_mod.region_depth(env, tr.z_region)
    tol = jnp.maximum(4.0 * eps, 1e-3 * tr.z_region)
    in_region = hit.valid & (hit.t <= tr.z_region + delta + tol)
    surface = (tr.ballistic & hit.valid) | (tr.diffusive & in_region)
    # diffusive regions with no triangle under the central ray are
    # midflight interactions (FSD through the aperture, or null)
    midflight = tr.diffusive & ~surface
    z_int = jnp.where(surface, hit.t, tr.z_region)
    has_interaction = lane & (surface | midflight)
    wp = st["ro"] + z_int[:, None] * st["rd"]
    fp_int = env.major(z_int)

    # ---- deferred FSD evaluation (prev segment modulation)
    if fsd:
        dst = jnp.where(has_interaction[:, None], wp,
                        st["ro"] + 4.0 * st["rd"])
        ev = fsd_mod.fsd_eval(st["fsd_ap"], k, st["prev_vert"], dst)
        # per-edge shadow tests, both legs + the direct segment —
        # batched into ONE trace call (a single traversal loop in the
        # compiled program instead of 2K+1)
        src_e = jnp.broadcast_to(st["prev_vert"][:, None, :],
                                 (N, K, 3))
        dst_e = jnp.broadcast_to(dst[:, None, :], (N, K, 3))
        a_pts = jnp.concatenate([
            src_e.reshape(-1, 3),            # leg 1 starts
            ev["p"].reshape(-1, 3),          # leg 2 starts
            st["prev_vert"],                 # direct
        ], axis=0)
        b_pts = jnp.concatenate([
            ev["p"].reshape(-1, 3),
            dst_e.reshape(-1, 3),
            dst,
        ], axis=0)
        # exclusions: both legs touch the edge's Fermat point, so its
        # two adjacent faces are excluded (rounding-robust visibility);
        # the dst-side leg and the direct segment exclude the hit tri
        et1, et2 = fsd_mod.aperture_face_tris(edge_table, st["fsd_ap"])
        ex1 = jnp.concatenate([
            et1.reshape(-1), et1.reshape(-1),
            jnp.full((N,), -1, jnp.int32)], axis=0)
        ex2 = jnp.concatenate([
            et2.reshape(-1), et2.reshape(-1), hit.tri], axis=0)
        ex3 = jnp.concatenate([
            jnp.full((N * K,), -1, jnp.int32),
            jnp.broadcast_to(hit.tri[:, None], (N, K)).reshape(-1),
            jnp.full((N,), -1, jnp.int32)], axis=0)
        seg = b_pts - a_pts
        seg_d = vec.safe_length(seg)
        seg_n = seg / jnp.maximum(seg_d, 1e-20)[:, None]
        occ_all = trace_mod.occluded(
            geo, a_pts, seg_n, jnp.full((a_pts.shape[0],), eps),
            seg_d - 2.0 * eps, ex1, ex2, ex3)
        s1 = occ_all[:N * K].reshape(N, K)
        s2 = occ_all[N * K:2 * N * K].reshape(N, K)
        occ_direct = occ_all[2 * N * K:]
        unshadowed = ~s1 & ~s2
        direct_vis = st["fsd_valid"] & ~occ_direct
        ts, th = fsd_mod.coherent_sum(ev, k, st["prev_vert"], dst,
                                      direct_vis, unshadowed)
        f_mod = fsd_mod.fsd_intensity(ts, th)
        f_mod = jnp.where(st["fsd_valid"] & jnp.isfinite(f_mod),
                          f_mod, 1.0)
        M_mul = st["M"] * f_mod[:, None, None]
        M_super = st["M"] + st["M_prev"] * f_mod[:, None, None]
        M_cur = jnp.where(st["fsd_valid"][:, None, None],
                          jnp.where(st["sampled_fsd"][:, None, None],
                                    M_mul, M_super),
                          st["M"])
    else:
        M_cur = st["M"]

    # ---- shading frame at the surface
    sf = frame_mod.build_shading_frame(hit.ns, hit.dpdu)
    sf = bsdf_dev.apply_normalmap(tables, hit.mat_id, hit.uv, k, sf)
    wi = -st["rd"]
    wi_l = sf.to_local(wi)

    # ---- emission MIS
    cos_out = vec.dot(wi, hit.geo_n)
    Le = etab.emission_radiance(et, tables.spectra, hit.emitter_id, k,
                                cos_out)
    d2 = jnp.maximum(hit.t, 1e-9) ** 2
    pdf_nee_same = etab.pdf_direct_solid_angle(
        et, hit.emitter_id, d2, cos_out) \
        * _emitter_pmf(et, hit.emitter_id)
    w_mis_e = jnp.where(st["prev_specular"], 1.0,
                        _power_heuristic(st["prev_pdf"],
                                         pdf_nee_same)) if mis else 1.0
    L = st["L"] + jnp.where((surface & (Le > 0))[:, None],
                            jnp.asarray(w_mis_e)[..., None]
                            * contribution(M_cur, Le), 0.0)

    # ---- NEE (surface lanes)
    u_pick = rng.uniform(dkeys, rng.D_EMITTER_PICK)
    e_n, pmf_n = _sample_emitter_by_power(et, u_pick)
    u_nee = rng.uniform(dkeys, rng.D_NEE, 3)
    nee = etab.sample_direct(et, geo, tables.spectra, e_n, hit.p, k,
                             u_nee)
    wo_nee_l = sf.to_local(nee["wo"])
    # uv-space footprint diameter for mip-filtered texture lookups
    # (beam footprint / surface tangent scale)
    duv = 2.0 * fp_int / jnp.maximum(vec.length(hit.dpdu), 1e-9)
    f_nee, pdf_b_nee = bsdf_dev.eval_f(tables, hit.mat_id, wi_l,
                                       wo_nee_l, hit.uv, k, duv)
    occ = trace_mod.occluded(geo, hit.p, nee["wo"],
                             jnp.full((N,), eps),
                             nee["dist"] - 2.0 * eps,
                             hit.tri, nee["tri"])
    pdf_nee = pmf_n * nee["pdf_sa"]
    w_mis_n = jnp.where(nee["delta_dir"], 1.0,
                        _power_heuristic(pdf_nee, pdf_b_nee)) \
        if mis else 1.0
    M_nee, _ = compose_scatter(M_cur, st["xf"], -st["rd"], f_nee,
                               -nee["wo"])
    c_nee = contribution(M_nee, nee["Li"]) \
        / jnp.maximum(pdf_nee, 1e-30)[:, None]
    ok_nee = surface & nee["valid"] & (~occ) & (pdf_nee > 0) \
        & (f_nee[:, 0, 0] > 0)
    L = L + jnp.where(ok_nee[:, None],
                      jnp.asarray(w_mis_n)[..., None] * c_nee, 0.0)

    # ---- surface interaction
    u_b = jnp.concatenate([
        rng.uniform(dkeys, rng.D_BSDF_LOBE, 2),
        rng.uniform(dkeys, rng.D_BSDF_DIR, 2)], axis=-1)
    bs = bsdf_dev.sample(tables, hit.mat_id, wi_l, hit.uv, k, u_b, duv)
    wo_surface = sf.to_world(bs.wo)
    M_surf, xf_surf = compose_scatter(M_cur, st["xf"], -st["rd"],
                                      bs.Mw, -wo_surface)
    # new elliptic envelope through the projected surface-footprint
    # ellipse (cone_through_ellipse; grazing incidence stretches the
    # footprint anisotropically — reference beam.hpp:379-397)
    env_surf, _sid = env_mod.surface_scatter(
        env, st["rd"], z_int, hit.geo_n, wo_surface, bs.specular, k)

    # ---- FSD interaction (midflight lanes)
    if fsd:
        ap_now = fsd_mod.build_aperture(
            edge_table, eidx, wp, -st["rd"], Z_SCALE * fp_int)
        u_fsd = jnp.concatenate(
            [rng.uniform(dkeys, rng.D_FSD, 2),
             rng.uniform(dkeys, rng.D_BSDF_DIR, 2)], axis=-1)
        fsmp = fsd_mod.fsd_sample(ap_now, k, st["ro"], wp, u_fsd)
        # sampled-FSD weight: 1/pdf enters the beam scale
        w_fsd = 1.0 / jnp.maximum(fsmp["pdf"], 1e-20)
        w_fsd = jnp.where(fsmp["is_direct"],
                          (ap_now.count() + 1).astype(jnp.float32),
                          w_fsd)
    else:
        ap_now = fsd_mod.empty_aperture(N, K)
        fsmp = dict(wo=st["rd"], p=wp,
                    is_direct=jnp.ones((N,), bool),
                    pdf=jnp.ones((N,)),
                    valid=jnp.zeros((N,), bool))
        w_fsd = jnp.ones((N,))

    fsd_lane = midflight & fsmp["valid"] & jnp.asarray(fsd)
    null_lane = midflight & ~fsd_lane

    # ---- combine interaction outcomes
    ro_new = jnp.where(surface[:, None], hit.p,
                       jnp.where(fsd_lane[:, None], fsmp["p"], wp))
    rd_new = jnp.where(surface[:, None], wo_surface,
                       jnp.where(fsd_lane[:, None], fsmp["wo"],
                                 st["rd"]))
    M_new = jnp.where(surface[:, None, None], M_surf,
                      M_cur * jnp.where(fsd_lane, w_fsd,
                                        1.0)[:, None, None])
    xf_new = jnp.where(surface[:, None], xf_surf,
                       _perp_axis(-rd_new))
    exclude_new = jnp.where(surface, hit.tri, st["exclude"])
    # FSD lanes restart as a near-point MUB source at the aperture;
    # null lanes carry the envelope forward re-anchored at wp
    env_fsd = sourcing.restart_envelope(rd_new, fp_int, k)
    env_null = env_mod.EnvState(x=env.x, x0=fp_int, ta=env.ta,
                                e=env.e)
    env_new = env_mod.select(
        surface, env_surf, env_mod.select(fsd_lane, env_fsd, env_null))
    pdf_new = jnp.where(surface, bs.pdf, 1.0)
    spec_new = jnp.where(surface, bs.specular, True)

    # ---- new deferred aperture carry
    fsd_valid_new = jnp.asarray(fsd) & has_interaction \
        & ap_now.any_valid()
    sampled_fsd_new = fsd_lane

    # ---- russian roulette (not on null continuation)
    u_rr = rng.uniform(dkeys, rng.D_RR)
    beta = jnp.abs(M_new[:, 0, 0])
    q = jnp.clip(beta, rr_floor, 1.0)
    do_rr = (depth >= rr_depth) & ~null_lane
    survive = jnp.where(do_rr, u_rr < q, True)
    M_new = M_new / jnp.where(do_rr, q, 1.0)[:, None, None]

    cont = (surface & bs.valid) | fsd_lane | null_lane
    active = lane & cont & survive & (beta > 1e-12)

    stats = st["stats"]
    if with_stats:
        f32 = jnp.float32
        stats = stats.at[STAT_RAYS].add(lane.sum(dtype=f32))
        # NEE shadow + the batched FSD legs (2K+1 per lane)
        stats = stats.at[STAT_SHADOW].add(
            surface.sum(dtype=f32)
            + (2 * K + 1) * lane.sum(dtype=f32) * float(bool(fsd)))
        stats = stats.at[STAT_SURFACE].add(surface.sum(dtype=f32))
        stats = stats.at[STAT_FSD].add(fsd_lane.sum(dtype=f32))
        stats = stats.at[STAT_NULL].add(null_lane.sum(dtype=f32))
        stats = stats.at[STAT_RR_KILL].add(
            (lane & cont & ~survive).sum(dtype=f32))
        stats = stats.at[STAT_DEPTH_SUM].add(active.sum(dtype=f32))
        stats = stats.at[STAT_EDGE_HIT].add(
            (lane & have_edges).sum(dtype=f32))
        stats = stats.at[STAT_BALLISTIC].add(
            (lane & tr.ballistic).sum(dtype=f32))
        stats = stats.at[STAT_DIFFUSIVE].add(
            (lane & tr.diffusive).sum(dtype=f32))
        # pair-test counters (ads_stats.hpp:63 analogue): one trace +
        # the 2K+1 coherent shadow legs + NEE per lane, scaled by the
        # ray backend actually selected (0 under the data-dependent
        # BVH); cone tests per the query mode selected above
        stats = stats.at[STAT_TRI_TESTS].add(
            (2.0 + (2 * K + 1) * float(bool(fsd))) * N
            * trace_mod.ray_tests_per_lane(geo))
        stats = stats.at[STAT_CONE_TESTS].add(N * cone_tests_per_lane)
        # tris-per-cone histogram (reference ads_stats.hpp:78-86)
        stats = stats.at[STAT_TRI_HIST0 + tri_hist_bin(tcnt)].add(
            lane.astype(f32))

    def sel(new, old):
        br = active
        for _ in range(new.ndim - 1):
            br = br[..., None]
        return jnp.where(br, new, old)

    return dict(
        ro=sel(ro_new, st["ro"]), rd=sel(rd_new, st["rd"]),
        M=sel(M_new, st["M"]), xf=sel(xf_new, st["xf"]),
        L=L, active=active,
        exclude=sel(exclude_new, st["exclude"]),
        prev_pdf=sel(pdf_new, st["prev_pdf"]),
        prev_specular=sel(spec_new, st["prev_specular"]),
        env=env_mod.select(active, env_new, st["env"]),
        fsd_ap=jax.tree.map(
            lambda n, o: jnp.where(
                active.reshape(active.shape + (1,) * (n.ndim - 1)),
                n, o), ap_now, st["fsd_ap"]),
        fsd_valid=active & fsd_valid_new,
        sampled_fsd=sel(sampled_fsd_new, st["sampled_fsd"]),
        prev_vert=sel(st["ro"], st["prev_vert"]),
        # (the deferred coherent sum runs from the segment ORIGIN —
        # the beam arriving at the aperture — reference
        # plt_path_detail.hpp:72 prev_vert_beam saved pre-transform)
        M_prev=sel(M_cur, st["M_prev"]),
        stats=stats,
    )
