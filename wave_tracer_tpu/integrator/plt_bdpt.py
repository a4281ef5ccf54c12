"""plt_bdpt — bidirectional path tracing, wavefront over lane-stacked
subpath vertex arrays.

TPU re-design of reference include/wt/integrator/plt_bdpt/
plt_bdpt_detail.hpp:286-930 and vertex.hpp:49-567: per lane, a camera
subpath and an emitter subpath are generated and stored as fixed-capacity
SoA vertex arrays (position, normal, throughput, forward/reverse
area-measure pdfs, delta flags); every (s, t) strategy is then connected
with a shadow ray and weighted by the balance heuristic computed
iteratively from the stored pdf arrays (the reference's
bdpt_compute_mis_weight recursion, :604-716, unrolled over the fixed
vertex capacity).

The walks carry a beam envelope and perform **Fraunhofer free-space
diffraction** at mid-flight interaction regions (reference
sample_fraunhofer_fsd_interaction, plt_bdpt_detail.hpp:286-346): edges
inside the swept envelope form a canonical aperture (wave/fraunhofer.py),
the un-blocked beam power I = 1 − ∫wavefront over clipped region
triangles (find_closest_triangle, :353-419 — gaussian2d integrate
triangle) normalizes the ASF, and an unbiased RIS draw redirects the
beam. Each FSD vertex stores its aperture so it can serve as a
CONNECTION ENDPOINT (reference connects through fsd vertices,
:597-930): connections evaluate the scalar ASF for the connecting
direction (the fsd wrapper's f() equals its pdf, fsd_sampler.cpp:
105-110) with no surface cosine; reverse pdfs remain approximate (the
reference does the same, :334 "TODO: fsd reverse interaction pdf").

Transport is fully polarimetric (reference beam.hpp:31-248): the camera
subpath composes frame-aware Mueller operators, the light subpath carries
Stokes vectors, and every connection rotates the light-side Stokes into
the camera chain's expected frame before contraction (integrate_beams,
beam.hpp:562-603). Light-tracing (t=1) splats are returned separately
for the direct-splat film path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wave_tracer_tpu.accel import edges as edges_mod
from wave_tracer_tpu.accel import trace as trace_mod
from wave_tracer_tpu.bsdf import device as bsdf_dev
from wave_tracer_tpu.emitter import table as etab
from wave_tracer_tpu.integrator.path import (N_STATS, STAT_DEPTH_SUM,
                                             STAT_EDGE_HIT, STAT_FSD,
                                             STAT_NULL, STAT_RAYS,
                                             STAT_SHADOW, STAT_SURFACE,
                                             _perp_axis, compose_scatter,
                                             _sample_emitter_by_power)
from wave_tracer_tpu.polarization import stokes as stokes_mod
from wave_tracer_tpu.math import frame as frame_mod
from wave_tracer_tpu.math import gaussian2d as g2d
from wave_tracer_tpu.math import vec
from wave_tracer_tpu.sampling import rng
from wave_tracer_tpu.wave import beam as beam_geo
from wave_tracer_tpu.wave import envelope as env_mod
from wave_tracer_tpu.wave import fraunhofer as fr
from wave_tracer_tpu.wave import sourcing

BIG = 1e30
Z_SCALE = 2.0          # interaction-region half-depth / footprint
M_RIS = 8              # RIS proposals per FSD interaction
K_TRI = 8              # region triangles for the blocked-flux integral


def _emit_at(arr, cur, val, do):
    """Scatter per-lane val into slot `cur` of (N, V, ...) storage."""
    V = arr.shape[1]
    sel = (jnp.arange(V)[None, :] == cur[:, None]) & do[:, None]
    extra = arr.ndim - 2
    sel = sel.reshape(sel.shape + (1,) * extra)
    val = val[:, None]
    return jnp.where(sel, val, arr)


def _safe_cross(a, b):
    s = jnp.cross(a, b)
    ln = jnp.linalg.norm(s, axis=-1, keepdims=True)
    return jnp.where(ln < 1e-7, _perp_axis(a), s / jnp.maximum(ln, 1e-12))


def _blocked_flux(geo, ro, rd, fx, fy, z_int, dz, x0, ta, sigma,
                  tri_clusters=None):
    """Fraction of beam power blocked by front-facing geometry inside the
    interaction region (reference find_closest_triangle integrate_tris,
    plt_bdpt_detail.hpp:390-417): ball-query triangles, clip to the
    z-slab in beam coordinates, cone-project onto the cross-section, and
    integrate the Gaussian wavefront over each clipped polygon."""
    N = ro.shape[0]
    wp = ro + z_int[:, None] * rd
    r_env = x0 + ta * z_int
    r_ball = jnp.sqrt(r_env ** 2 + dz ** 2) * 1.05
    if tri_clusters is not None \
            and geo.num_tris > trace_mod.tri_cluster_min():
        idx, _, _ = trace_mod.tris_in_ball_clustered(
            geo, tri_clusters, wp, r_ball, K_TRI)
    else:
        idx, _, _ = trace_mod.tris_in_ball(geo, wp, r_ball, K_TRI)
    i = jnp.maximum(idx, 0)
    ok = idx >= 0
    # geometry blocks regardless of facing (the reference integrates the
    # record's facing side only, :395-397 — both-sided here; overlap
    # double-counting is bounded by the 0.95 clip either way)

    def to_local(v):
        w = v - ro[:, None, :]
        return jnp.stack([jnp.sum(w * fx[:, None, :], axis=-1),
                          jnp.sum(w * fy[:, None, :], axis=-1),
                          jnp.sum(w * rd[:, None, :], axis=-1)], axis=-1)

    va = to_local(geo.p0[i])
    vb = to_local(geo.p0[i] + geo.e1[i])
    vc = to_local(geo.p0[i] + geo.e2[i])
    z0 = jnp.broadcast_to((z_int - dz)[:, None], (N, K_TRI))
    z1 = jnp.broadcast_to((z_int + dz)[:, None], (N, K_TRI))
    verts, nv = g2d.clip_triangle_z(va, vb, vc, z0, z1)
    # cone projection onto the cross-section at z_int: scale xy by
    # r(z_int)/r(z) along the envelope's expansion lines
    # (envelope.project_local, reference elliptic_cone.hpp)
    rz = x0[:, None, None] + ta[:, None, None] * verts[..., 2]
    factor = r_env[:, None, None] / jnp.maximum(rz, 1e-12)
    xy = verts[..., :2] * factor[..., None]
    sig = jnp.broadcast_to(sigma[:, None], (N, K_TRI))
    mass = g2d.polygon_gaussian_mass(
        jnp.concatenate([xy, verts[..., 2:]], axis=-1), nv, sig, sig)
    blocked = jnp.sum(jnp.where(ok, mass, 0.0), axis=1)
    return jnp.clip(blocked, 0.0, 0.95)


def _walk(data, sensor, keys, k, ro, rd, beta0, pdf_dir0, max_verts,
          eps, salt_base, *, ta0, polar, edge_table=None,
          edge_clusters=None, fsd=False, K=8, subdiv=3):
    """Random walk storing up to max_verts vertices (surface + FSD).

    polar: "mueller" — the walk composes frame-aware Mueller operators
    (camera subpath, backward transport); "stokes" — it propagates a
    Stokes vector (light subpath, forward transport). Reference
    beam_t<transport> (beam.hpp:31-248).

    Returns dict of (N, V, ...) arrays: p, ns, gn, uv, mat, wi (toward the
    previous vertex, world), beta (scalar throughput INTO the vertex),
    pol (Mueller (N,V,4,4) or Stokes (N,V,4) INTO the vertex), pax
    (its transverse frame axis), pdf_fwd (area pdf of this vertex from
    the previous one), delta (previous scatter was specular), fsd_v,
    valid.
    """
    geo = data.geo
    tables = data.tables
    et = data.emitters
    N = ro.shape[0]
    V = max_verts
    use_fsd = bool(fsd) and edge_table is not None \
        and int(edge_table.count) > 0
    mueller = polar == "mueller"

    if mueller:
        pol0 = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                (N, 4, 4)) * beta0[:, None, None]
        pol_store = jnp.zeros((N, V, 4, 4))
        pax0 = _perp_axis(-rd)
    else:
        pol0 = stokes_mod.unpolarized(beta0)
        pol_store = jnp.zeros((N, V, 4))
        pax0 = _perp_axis(rd)

    init = dict(
        ro=ro, rd=rd, beta=beta0, pdf_dir=pdf_dir0,
        pol=pol0, pax=pax0,
        stats=jnp.zeros((N_STATS,), jnp.float32),
        active=jnp.ones((N,), bool),
        exclude=jnp.full((N,), -1, jnp.int32),
        delta=jnp.zeros((N,), bool),
        # full elliptic envelope (reference beam.hpp elliptic cone)
        env=env_mod.EnvState(
            x=_perp_axis(rd), x0=jnp.zeros((N,), jnp.float32),
            ta=jnp.asarray(ta0) * jnp.ones((N,), jnp.float32),
            e=jnp.ones((N,), jnp.float32)),
        cur=jnp.zeros((N,), jnp.int32),
        # storage
        p=jnp.zeros((N, V, 3)), ns=jnp.zeros((N, V, 3)),
        gn=jnp.zeros((N, V, 3)), uv=jnp.zeros((N, V, 2)),
        mat=jnp.full((N, V), -1, jnp.int32),
        emitter=jnp.full((N, V), -1, jnp.int32),
        wi=jnp.zeros((N, V, 3)),
        beta_v=jnp.zeros((N, V)),
        pol_v=pol_store,
        pax_v=jnp.zeros((N, V, 3)),
        pdf_fwd=jnp.zeros((N, V)),
        pdf_rev=jnp.zeros((N, V)),
        delta_v=jnp.zeros((N, V), bool),
        fsd_v=jnp.zeros((N, V), bool),
        valid=jnp.zeros((N, V), bool),
        # per-vertex Fraunhofer aperture state so FSD vertices can serve
        # as connection endpoints (reference connects through fsd
        # vertices, plt_bdpt_detail.hpp:597-930)
        ap_v=jax.tree.map(
            lambda a: jnp.zeros((N, V) + a.shape[1:], a.dtype),
            fr.empty_fr_aperture(N, K * subdiv)),
        scale_v=jnp.zeros((N, V)),
        recpI_v=jnp.zeros((N, V)),
    )

    def body(i, st):
        dkeys = rng.depth_key(keys, salt_base + i)
        lane = st["active"] & (st["cur"] < V)
        t, tri, u, v = trace_mod.trace(geo, st["ro"], st["rd"],
                                       jnp.full((N,), eps),
                                       jnp.full((N,), BIG), st["exclude"])
        hit = trace_mod.hit_attributes(geo, st["ro"], st["rd"], t, tri, u,
                                       v)

        env = st["env"]
        # ---- edge sweep inside the beam envelope (major-axis radius)
        if use_fsd:
            zmax = jnp.where(hit.valid, hit.t * 1.02 + env.x0,
                             8.0 * et.scene_radius)
            if int(edge_table.count) > 2048 and edge_clusters is not None:
                eidx, ez, ecnt = edges_mod.edges_near_cone_clustered(
                    edge_table, edge_clusters, st["ro"], st["rd"],
                    env, zmax, K)
            else:
                eidx, ez, ecnt = edges_mod.edges_near_cone(
                    edge_table, st["ro"], st["rd"], env, zmax, K)
            have_edges = ecnt > 0
            z_first = jnp.where(have_edges, jnp.min(ez, axis=1), BIG)
            fp_hit = env.major(jnp.where(hit.valid, hit.t, 0.0))
            delta_hit = jnp.maximum(Z_SCALE * fp_hit, 4.0 * eps)
            midflight = have_edges & (z_first < jnp.where(
                hit.valid, hit.t - delta_hit, BIG))
        else:
            midflight = jnp.zeros((N,), bool)
            z_first = jnp.full((N,), BIG)

        surface = lane & hit.valid & ~midflight
        midflight = lane & midflight

        # solid-angle → area pdf at the hit
        cos_hit = jnp.abs(vec.dot(st["rd"], hit.geo_n))
        d2 = jnp.maximum(hit.t, 1e-9) ** 2
        pdf_area = st["pdf_dir"] * cos_hit / d2

        sf = frame_mod.build_shading_frame(hit.ns, hit.dpdu)
        sf = bsdf_dev.apply_normalmap(tables, hit.mat_id, hit.uv, k, sf)
        wi_l = sf.to_local(-st["rd"])

        # ---- Fraunhofer FSD interaction at the mid-flight region
        if use_fsd:
            z_int = z_first
            fp_int = env.major(z_int)
            wp = st["ro"] + z_int[:, None] * st["rd"]
            # wavefront sigma from the isotropic-equivalent radius
            sigma = jnp.maximum(env.area_radius(z_int), 1e-9) \
                / beam_geo.ENVELOPE
            fx = _perp_axis(st["rd"])
            fy = jnp.cross(st["rd"], fx)
            # (no wavefront curvature phase here: the lens-less Fourier
            # correction needs the DETECTOR distance, which a bdpt walk
            # does not know at scatter time — the forward/coverage
            # kernel applies it against its known sensing plane,
            # plt_path_forward.py. The 1/R_src term alone cancels only
            # ~12% of the source-cone fringe smear and is not worth the
            # state it would add to the walk.)
            ap, scale = fr.build_aperture_3d(
                edge_table, eidx, wp, st["rd"], fx, fy, sigma,
                jnp.maximum(fp_int, 1e-9), k, subdiv=subdiv)
            dz = jnp.maximum(Z_SCALE * fp_int, 4.0 * eps)
            blocked = _blocked_flux(geo, st["ro"], st["rd"], fx, fy,
                                    z_int, dz, env.x0,
                                    env.ta, sigma,
                                    tri_clusters=getattr(
                                        data, "tri_clusters", None))
            recp_I = 1.0 / jnp.maximum(1.0 - blocked, 0.05)
            uR = rng.uniform(dkeys, rng.D_FSD, 4 * M_RIS + 1)
            xi, asf_v, w_ris, vs = fr.sample_xi_sir(
                ap, uR[:, :4 * M_RIS].reshape(N, M_RIS, 4),
                uR[:, 4 * M_RIS])
            wo_l, ok_wo = fr.xi_to_wo(xi, scale)
            wo_fsd = wo_l[:, 0:1] * fx + wo_l[:, 1:2] * fy \
                + wo_l[:, 2:3] * st["rd"]
            pdf_fsd = asf_v * recp_I
            ap_any = jnp.any(ap.valid, axis=1)
            # WEIGHT-1 convention, like the reference (fsd_sampler.cpp:
            # 105-110): the classification (axis hits a region triangle
            # → surface at full weight; axis through open → redirect at
            # full weight) IS the flux partition whenever the lane
            # ensemble's aiming densely samples the wavefront footprint
            # — true for camera/emitter subpaths in diffuse interiors
            # (box/veach: bdpt-vs-path agreement holds at 1.01). The
            # per-beam (1 − blocked) partition that plt_path_forward
            # applies is the correct convention ONLY for collimated
            # sources whose aiming cone is narrower than the screen
            # structure (the double-slit Kirchhoff calibration);
            # applying it here double-counts the partition and was
            # measured to break veach bdpt/path agreement (r5).
            w_fsd = jnp.ones((N,))
            fsd_lane = midflight & ap_any & vs & ok_wo \
                & jnp.isfinite(pdf_fsd) & (pdf_fsd > 0)
            null_lane = midflight & ~ap_any
            # (midflight lanes with a non-empty aperture but an invalid
            # draw terminate, as in the reference :322-324)
        else:
            z_int = z_first
            wp = st["ro"]
            fp_int = jnp.zeros((N,))
            wo_fsd = st["rd"]
            w_fsd = jnp.ones((N,))
            pdf_fsd = jnp.ones((N,))
            fsd_lane = jnp.zeros((N,), bool)
            null_lane = jnp.zeros((N,), bool)
            ap = fr.empty_fr_aperture(N, K * subdiv)
            scale = jnp.zeros((N,))
            recp_I = jnp.ones((N,))

        # ---- store vertex (surface or FSD; null consumes no slot).
        # Lanes branched into the FSD redirect store an FSD vertex —
        # the full weight rides the redirect (flux-consistent
        # partition above)
        surface_eff = surface & ~fsd_lane
        store = surface_eff | fsd_lane
        pdf_fwd_v = jnp.where(surface_eff, pdf_area,
                              st["pdf_dir"] / jnp.maximum(z_int, 1e-9)
                              ** 2)
        st["p"] = _emit_at(st["p"], st["cur"],
                           jnp.where(surface_eff[:, None], hit.p, wp),
                           store)
        st["ns"] = _emit_at(st["ns"], st["cur"],
                            jnp.where(surface_eff[:, None], sf.n,
                                      st["rd"]), store)
        st["gn"] = _emit_at(st["gn"], st["cur"],
                            jnp.where(surface_eff[:, None], hit.geo_n,
                                      st["rd"]), store)
        st["uv"] = _emit_at(st["uv"], st["cur"], hit.uv, store)
        st["mat"] = _emit_at(st["mat"], st["cur"],
                             jnp.where(surface_eff, hit.mat_id, -1),
                             store)
        st["emitter"] = _emit_at(st["emitter"], st["cur"],
                                 jnp.where(surface_eff, hit.emitter_id,
                                           -1), store)
        st["wi"] = _emit_at(st["wi"], st["cur"], -st["rd"], store)
        st["beta_v"] = _emit_at(st["beta_v"], st["cur"], st["beta"],
                                store)
        st["pol_v"] = _emit_at(st["pol_v"], st["cur"], st["pol"], store)
        st["pax_v"] = _emit_at(st["pax_v"], st["cur"], st["pax"], store)
        st["pdf_fwd"] = _emit_at(st["pdf_fwd"], st["cur"], pdf_fwd_v,
                                 store)
        st["delta_v"] = _emit_at(st["delta_v"], st["cur"], st["delta"],
                                 store)
        st["fsd_v"] = _emit_at(st["fsd_v"], st["cur"], fsd_lane, store)
        st["valid"] = _emit_at(st["valid"], st["cur"],
                               jnp.ones((N,), bool), store)
        st["ap_v"] = jax.tree.map(
            lambda s, val: _emit_at(s, st["cur"], val,
                                    store & fsd_lane), st["ap_v"], ap)
        st["scale_v"] = _emit_at(st["scale_v"], st["cur"], scale,
                                 store & fsd_lane)
        st["recpI_v"] = _emit_at(st["recpI_v"], st["cur"], recp_I,
                                 store & fsd_lane)

        # ---- continue the walk
        u_b = jnp.concatenate([
            rng.uniform(dkeys, rng.D_BSDF_LOBE, 2),
            rng.uniform(dkeys, rng.D_BSDF_DIR, 2)], axis=-1)
        bs = bsdf_dev.sample(tables, hit.mat_id, wi_l, hit.uv, k, u_b)
        wo_w = sf.to_world(bs.wo)

        # reverse pdf of the PREVIOUS vertex from here (for MIS)
        f_rev, pdf_rev_dir = bsdf_dev.eval_f(tables, hit.mat_id, bs.wo,
                                             wi_l, hit.uv, k)
        prev_c = jnp.maximum(st["cur"] - 1, 0)
        prev_gn = jnp.take_along_axis(
            st["gn"], prev_c[:, None, None].repeat(3, axis=-1),
            axis=1)[:, 0, :]
        prev_cos = jnp.abs(vec.dot(st["rd"], prev_gn))
        pdf_rev_prev = jnp.where(bs.specular, 0.0,
                                 pdf_rev_dir * prev_cos / d2)
        pdf_rev_prev = jnp.where(
            fsd_lane,
            pdf_fsd * prev_cos / jnp.maximum(z_int, 1e-9) ** 2,
            pdf_rev_prev)
        st["pdf_rev"] = _emit_at(st["pdf_rev"], prev_c, pdf_rev_prev,
                                 store & (st["cur"] > 0))

        # envelope updates: new elliptic cone through the projected
        # surface-footprint ellipse (reference beam.hpp:379-397)
        env_surf, _sid = env_mod.surface_scatter(
            env, st["rd"], hit.t, hit.geo_n, wo_w, bs.specular, k)
        ta_fsd = beam_geo.minimum_uncertainty_tan_alpha(
            jnp.maximum(fp_int, 1e-9) ** 2, k)

        beta_surf = st["beta"] * jnp.abs(bs.Mw[:, 0, 0])
        beta_next = jnp.where(surface_eff, beta_surf,
                              st["beta"] * jnp.where(fsd_lane, w_fsd,
                                                     1.0))

        # polarized throughput update (frame-aware; reference
        # beam.transform_surface_interaction / transform_region_interaction)
        if mueller:
            pol_surf, pax_surf = compose_scatter(st["pol"], st["pax"],
                                                 -st["rd"], bs.Mw, -wo_w)
        else:
            s_ax = _safe_cross(st["rd"], wo_w)
            S_rot = stokes_mod.reorient(st["pol"], st["pax"], s_ax,
                                        st["rd"])
            pol_surf = jnp.einsum("nij,nj->ni", bs.Mw, S_rot)
            pax_surf = s_ax

        cont = (surface_eff & bs.valid) | fsd_lane | null_lane
        active = lane & cont & (beta_next > 1e-25)
        ro_new = jnp.where(surface_eff[:, None], hit.p, wp)
        rd_new = jnp.where(surface_eff[:, None], wo_w,
                           jnp.where(fsd_lane[:, None], wo_fsd,
                                     st["rd"]))
        scl_mid = jnp.where(fsd_lane, w_fsd, 1.0)
        # FSD turns parallel-transport the transverse axis onto the new
        # direction (Gram–Schmidt); null continuation keeps it
        gs = st["pax"] - rd_new * vec.dot(st["pax"], rd_new)[:, None]
        gl = jnp.linalg.norm(gs, axis=-1, keepdims=True)
        pax_pt = jnp.where(gl < 1e-6, _perp_axis(rd_new),
                           gs / jnp.maximum(gl, 1e-12))
        pax_mid = jnp.where(fsd_lane[:, None], pax_pt, st["pax"])
        if mueller:
            pol_new = jnp.where(surface_eff[:, None, None], pol_surf,
                                st["pol"] * scl_mid[:, None, None])
        else:
            pol_new = jnp.where(surface_eff[:, None], pol_surf,
                                st["pol"] * scl_mid[:, None])
        pax_new = jnp.where(surface_eff[:, None], pax_surf, pax_mid)
        st["pol"] = jnp.where(
            active.reshape((N,) + (1,) * (pol_new.ndim - 1)), pol_new,
            st["pol"])
        st["pax"] = jnp.where(active[:, None], pax_new, st["pax"])
        st["ro"] = jnp.where(active[:, None], ro_new, st["ro"])
        st["rd"] = jnp.where(active[:, None], rd_new, st["rd"])
        st["beta"] = jnp.where(active, beta_next, st["beta"])
        st["pdf_dir"] = jnp.where(
            active, jnp.where(surface_eff,
                              jnp.where(bs.specular, 1.0, bs.pdf),
                              jnp.where(fsd_lane, pdf_fsd,
                                        st["pdf_dir"])), st["pdf_dir"])
        st["exclude"] = jnp.where(active & surface, hit.tri,
                                  jnp.where(active, -1, st["exclude"]))
        st["delta"] = jnp.where(active,
                                jnp.where(surface_eff, bs.specular,
                                          False), st["delta"])
        env_fsd = env_mod.EnvState(
            x=_perp_axis(rd_new), x0=jnp.full((N,), 1e-6),
            ta=jnp.minimum(ta_fsd, 0.3), e=jnp.ones((N,)))
        env_null = env_mod.EnvState(x=env.x, x0=fp_int, ta=env.ta,
                                    e=env.e)
        env_new = env_mod.select(
            surface_eff, env_surf, env_mod.select(fsd_lane, env_fsd,
                                                  env_null))
        st["env"] = env_mod.select(active, env_new, st["env"])
        st["cur"] = st["cur"] + store.astype(jnp.int32)
        st["active"] = active
        # device counters (reference include/wt/integrator/stats.hpp:
        # 19-84 interaction-type counters + path-depth accumulation)
        f32 = jnp.float32
        stats = st["stats"]
        stats = stats.at[STAT_RAYS].add(lane.sum(dtype=f32))
        stats = stats.at[STAT_SURFACE].add(surface_eff.sum(dtype=f32))
        stats = stats.at[STAT_FSD].add(fsd_lane.sum(dtype=f32))
        stats = stats.at[STAT_NULL].add(null_lane.sum(dtype=f32))
        stats = stats.at[STAT_DEPTH_SUM].add(active.sum(dtype=f32))
        stats = stats.at[STAT_EDGE_HIT].add(
            (lane & midflight).sum(dtype=f32))
        st["stats"] = stats
        return st

    st = jax.lax.fori_loop(0, V + 2, body, init)
    return st


def _geometry_term(pa, na, pb, nb):
    d = pb - pa
    d2 = jnp.maximum(vec.length2(d), 1e-18)
    dn = d / jnp.sqrt(d2)[..., None]
    return (jnp.abs(vec.dot(dn, na)) * jnp.abs(vec.dot(dn, nb)) / d2,
            dn, jnp.sqrt(d2))


def _chain_tables(pdf_fwd, pdf_rev, delta_v):
    """Per-lane MIS chain tables over a stored subpath — the iterative
    form of the reference's bdpt_compute_mis_weight pdf-ratio recursion
    (reference plt_bdpt_detail.hpp:604-716), precomputed ONCE so each
    strategy's weight is O(1).

    r[j] = pdf_rev[j+1]/pdf_fwd[j] re-expresses vertex j as sampled from
    the opposite side. Returns:
      S_tab[:, tau] = sum_{j<=tau-2} (prod_{m=j}^{tau-2} r[m]) * mask_j
                      (interior alternatives of a tau-vertex chain)
      F_tab[:, tau] = prod_{m=0}^{tau-2} r[m] (unmasked full product,
                      for appending emitter-vertex alternatives)
    """
    N, V = pdf_fwd.shape
    r = pdf_rev[:, 1:] / jnp.maximum(pdf_fwd[:, :-1], 1e-30)
    mb = ((~delta_v[:, :-1]) & (pdf_rev[:, 1:] > 0)).astype(jnp.float32)
    S = [jnp.zeros((N,)), jnp.zeros((N,))]
    F = [jnp.ones((N,)), jnp.ones((N,))]
    for tau in range(2, V + 1):
        S.append(r[:, tau - 2] * (S[tau - 1] + mb[:, tau - 2]))
        F.append(r[:, tau - 2] * F[tau - 1])
    return jnp.stack(S, axis=1), jnp.stack(F, axis=1)


def _dyn(arr, i):
    """arr (N, V, ...) indexed at traced scalar slot i (clamped)."""
    i = jnp.clip(i, 0, arr.shape[1] - 1)
    return jax.lax.dynamic_index_in_dim(arr, i, axis=1, keepdims=False)


def _side_sum(tau, pconn, r_end_num, pdf_fwd, delta_v, S_tab,
              F_tab=None, bottom=None):
    """Sum of pdf ratios for the alternatives that re-sample one side's
    chain from the other side (exact endpoint remap: the top TWO
    transitions use per-strategy connection pdfs, interior transitions
    the stored walk pdfs — reference remaps endpoint pdfs the same way,
    vertex.hpp pdf overrides).

    tau: traced chain length (stored vertices); pconn: area pdf of the
    endpoint from across; r_end_num: area pdf of vertex tau-2 from the
    endpoint given the connection direction. bottom: extra alternatives
    appended below vertex 0 (emitter NEE / emission-hit), excluding the
    chain product factor."""
    pf_top = _dyn(pdf_fwd, tau - 1)
    d_top = _dyn(delta_v, tau - 1)
    ri0 = jnp.where(pf_top > 0, pconn / jnp.maximum(pf_top, 1e-30), 0.0)
    ssum = jnp.where(d_top, 0.0, ri0)
    pf_2 = _dyn(pdf_fwd, tau - 2)
    d_2 = _dyn(delta_v, tau - 2)
    r_end = r_end_num / jnp.maximum(pf_2, 1e-30)
    m_end = ((~d_2) & (r_end_num > 0)).astype(jnp.float32)
    S_t1 = _dyn(S_tab, tau - 1)
    ssum = ssum + jnp.where(tau >= 2, ri0 * r_end * (m_end + S_t1), 0.0)
    if bottom is not None:
        F_t1 = _dyn(F_tab, tau - 1)
        full = jnp.where(tau >= 2, ri0 * r_end * F_t1, ri0)
        ssum = ssum + full * bottom
    return ssum


def trace_bdpt(data, pixel_xy, jitter, base_key, sample_ids, *, sensor,
               max_depth: int = 4, eps: float = 1e-5, fsd: bool = False,
               K: int = 8, debug_buckets: bool = False,
               with_stats: bool = False):
    """One BDPT batch. Returns (pos, values (N,C), ok, light_splats):
    light_splats = (pos_lt (N*T,2), values_lt (N*T,C), ok_lt) — EVERY
    t=1 light-tracing vertex splats with its MIS weight (reference
    connect t=1 strategy, plt_bdpt_detail.hpp:718+), flattened for
    splat_direct."""
    import math as _m

    geo = data.geo
    tables = data.tables
    et = data.emitters
    sp = data.spectral
    N = pixel_xy.shape[0]
    S = max_depth          # camera subpath vertices
    T = max_depth          # light subpath vertices (emitter vertex 0
                           # handled separately)
    edge_table = getattr(data, "edges", None)
    edge_clusters = getattr(data, "edge_clusters", None)

    pixel_id = pixel_xy[:, 1] * sensor.width + pixel_xy[:, 0]
    keys = rng.sample_key(base_key, pixel_id, sample_ids)

    u_spec = rng.uniform(keys, rng.D_SPECTRUM, 2)
    e0, _ = sp.sample_emitter(u_spec[:, 0])
    k, _ = sp.sample_k(e0, u_spec[:, 1])
    w_spectral = 1.0 / jnp.maximum(sp.joint_spectral_density(k), 1e-30)

    # camera directional pdf (solid angle) of a pinhole with uniform
    # film-area sampling: p(w) = 1/(A_img cos^3); used consistently for
    # the camera chain bottom AND the t=1 splat MIS
    tan_half = _m.tan(0.5 * sensor.fov)
    A_img = (2 * tan_half) * (2 * tan_half * sensor.height / sensor.width)
    _, _, _, cam_fwd = sensor.camera_basis()
    cam_fwd = jnp.asarray(cam_fwd, jnp.float32)

    # ---- camera subpath
    ro_c, rd_c, pixel_tan_alpha = sensor.generate_rays(pixel_xy, jitter)
    cosz0 = jnp.maximum(vec.dot(rd_c, cam_fwd[None, :]), 1e-3)
    p_camdir0 = 1.0 / (A_img * cosz0 ** 3)
    cam = _walk(data, sensor, keys, k, ro_c, rd_c,
                jnp.full((N,), sensor.importance()),
                p_camdir0, S, eps, 0, polar="mueller",
                ta0=0.5 * pixel_tan_alpha, edge_table=edge_table,
                edge_clusters=edge_clusters, fsd=fsd, K=K)

    # ---- light subpath (vertex 0 on the emitter)
    u_em = jnp.concatenate([rng.uniform(keys, rng.D_EMITTER_POS, 3),
                            rng.uniform(keys, rng.D_EMITTER_DIR, 1)],
                           axis=-1)
    em = etab.sample_emission(et, geo, tables.spectra, e0, k, u_em)
    pmf_e = sp.pmf_emitter(e0)
    beta_l0 = em["weight"] / jnp.maximum(pmf_e, 1e-30)
    # unified sourcing_geometry_t (wave/sourcing.py)
    _, ta_l = sourcing.source_emitter_mub(et, e0, k)
    lgt = _walk(data, sensor, keys, k, em["y"], em["wo"], beta_l0,
                em["pdf_dir"], T, eps, 32, ta0=ta_l, polar="stokes",
                edge_table=edge_table, edge_clusters=edge_clusters,
                fsd=fsd, K=K)

    C = sensor.response.channels
    sens = sensor.response.sensitivities(k, tables.spectra, None)
    polarimetric = bool(getattr(sensor, "polarimetric", False))

    def contrib4(M, Sv):
        return jnp.einsum("nij,nj->ni", M, Sv)

    eye4 = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (N, 4, 4))

    def fsd_f_at(vs, idx, dn):
        """Scalar Fraunhofer FSD BSDF value (= its pdf; the reference
        fsd wrapper's f() equals pdf·sr, fsd_sampler.cpp:105-110) at
        stored vertex `idx` for outgoing direction dn, from the
        per-vertex aperture — this is what lets FSD vertices serve as
        connection endpoints (reference plt_bdpt_detail.hpp:597-930).
        Consistent with the _walk's weight-1 FSD convention (see the
        regime note there)."""
        ap_i = jax.tree.map(lambda a: _dyn(a, idx), vs["ap_v"])
        scale_i = _dyn(vs["scale_v"], idx)
        recpI_i = _dyn(vs["recpI_v"], idx)
        rd_v = -_dyn(vs["wi"], idx)          # beam direction INTO vertex
        fx = _perp_axis(rd_v)
        fy = jnp.cross(rd_v, fx)
        wol = jnp.stack([vec.dot(dn, fx), vec.dot(dn, fy),
                         vec.dot(dn, rd_v)], axis=-1)
        xi, okx = fr.wo_to_xi(wol, scale_i)
        f = fr.asf(ap_i, xi) * recpI_i
        ok = okx & jnp.isfinite(f) & (f >= 0)
        return jnp.where(ok, f, 0.0)

    # ---- MIS chain tables (O(1) weight per strategy)
    S_cam, F_cam = _chain_tables(cam["pdf_fwd"], cam["pdf_rev"],
                                 cam["delta_v"])
    S_lgt, F_lgt = _chain_tables(lgt["pdf_fwd"], lgt["pdf_rev"],
                                 lgt["delta_v"])

    # light-chain bottom alternatives (below stored vertex 0): the NEE
    # strategy (ratio 1 — NEE and emission position sampling share the
    # same area/delta measure; pmf cancels) and the emission-hit
    # strategy. Uses the stored incoming at lgt[0] (exact for chains of
    # >=3 stored vertices; the reference approximates these endpoint
    # fsd/bottom pdfs similarly, plt_bdpt_detail.hpp:334).
    dir0 = em["y"] - lgt["p"][:, 0]
    d0_2 = jnp.maximum(vec.length2(dir0), 1e-18)
    dir0 = dir0 / jnp.sqrt(d0_2)[:, None]
    cos_e0 = jnp.abs(vec.dot(em["ln"], -dir0))
    sfl0 = frame_mod.build_shading_frame(lgt["ns"][:, 0],
                                         _tangent_of(lgt["ns"][:, 0]))
    if T >= 2:
        in0 = jnp.where(lgt["valid"][:, 1:2], -lgt["wi"][:, 1], dir0)
    else:
        in0 = dir0
    _, pdf_lv0_to_em = bsdf_dev.eval_f(
        tables, lgt["mat"][:, 0], sfl0.to_local(in0),
        sfl0.to_local(dir0), lgt["uv"][:, 0], k)
    pdf_nee_sa0 = etab.pdf_direct_solid_angle(et, e0, d0_2, cos_e0) \
        * sp.pmf_emitter(e0)
    m_nee0 = (pdf_lv0_to_em > 0).astype(jnp.float32)
    r_hit0 = jnp.where(
        (et.etype[jnp.maximum(e0, 0)] == etab.ET_AREA) & (cos_e0 > 1e-6)
        & (pdf_nee_sa0 > 0),
        pdf_lv0_to_em / jnp.maximum(pdf_nee_sa0, 1e-30), 0.0)
    # ONLY the emission-hit alternative lives below the chain: the
    # NEE-position alternative (ratio 1 — NEE and emission position
    # sampling share the same area measure) is already the chain's
    # full-product term in _side_sum; adding it again double-counted it
    # and under-weighted every interior strategy by 12-15%
    bot_light = m_nee0 * r_hit0

    L = jnp.zeros((N, 4), jnp.float32)
    # per-strategy intensity sums (debug_buckets): s0 by t, conn by
    # (t, j), t=1 by light vertex
    dbg = dict(s0=jnp.zeros((S + 1,)), conn=jnp.zeros((S * (T + 1),)),
               t1=jnp.zeros((T,)))

    # ---- strategy s=0: camera path hits an emitter
    def s0_body(t, carry):
        L, d_s0 = carry
        v = t - 1
        p_v = _dyn(cam["p"], v)
        gn_v = _dyn(cam["gn"], v)
        wi_v = _dyn(cam["wi"], v)
        em_v = _dyn(cam["emitter"], v)
        Le = etab.emission_radiance(et, tables.spectra, em_v, k,
                                    vec.dot(wi_v, gn_v))
        ok = _dyn(cam["valid"], v) & (Le > 0)
        pdf_as_light = jnp.where(ok, _emitter_area_pdf(et, em_v), 0.0)
        # endpoint remap: emission DIRECTION pdf toward cam[t-2]
        p_prev = _dyn(cam["p"], v - 1)
        ns_prev = _dyn(cam["ns"], v - 1)
        Gd = p_prev - p_v
        dd2 = jnp.maximum(vec.length2(Gd), 1e-18)
        Gd = Gd / jnp.sqrt(dd2)[:, None]
        pdf_edir = etab.pdf_emission_dir(et, em_v, gn_v, Gd)
        r_end_num = pdf_edir * jnp.abs(vec.dot(Gd, ns_prev)) / dd2
        ssum = _side_sum(t, pdf_as_light, r_end_num, cam["pdf_fwd"],
                         cam["delta_v"], S_cam)
        w = jnp.where(t == 1, 1.0, 1.0 / jnp.maximum(1.0 + ssum, 1.0))
        c_emit = contrib4(_dyn(cam["pol_v"], v),
                          stokes_mod.unpolarized(Le))
        dL = jnp.where(ok[:, None], w[..., None] * c_emit, 0.0)
        d_s0 = d_s0.at[t].add(dL[:, 0].sum())
        return L + dL, d_s0

    L, dbg["s0"] = jax.lax.fori_loop(1, S + 1, s0_body, (L, dbg["s0"]))

    # ---- strategies s=1 (NEE) and s>=2 (vertex connections), flattened
    def conn_body(idx, carry):
        L, d_conn = carry
        t = 1 + idx // (T + 1)
        j = idx % (T + 1)
        cv = t - 1
        cam_fsd = _dyn(cam["fsd_v"], cv)
        cam_ok = _dyn(cam["valid"], cv) & ~_dyn(cam["delta_v"], cv)
        p_c = _dyn(cam["p"], cv)
        ns_c = _dyn(cam["ns"], cv)
        wi_c_w = _dyn(cam["wi"], cv)
        uv_c = _dyn(cam["uv"], cv)
        mat_c = _dyn(cam["mat"], cv)
        pol_c = _dyn(cam["pol_v"], cv)
        pax_c = _dyn(cam["pax_v"], cv)
        sfc = frame_mod.build_shading_frame(ns_c, _tangent_of(ns_c))
        wi_c = sfc.to_local(wi_c_w)
        # camera-side chain: pdf of cam[cv-1] from cv given incoming dn
        p_cprev = _dyn(cam["p"], cv - 1)
        ns_cprev = _dyn(cam["ns"], cv - 1)
        segc = p_cprev - p_c
        dc2 = jnp.maximum(vec.length2(segc), 1e-18)
        segc = segc / jnp.sqrt(dc2)[:, None]

        def cam_r_end(dn):
            """area pdf of cam[cv-1] from cv, incoming = dn (unit,
            cv -> light side)."""
            _, pdf = bsdf_dev.eval_f(tables, mat_c, sfc.to_local(dn),
                                     wi_c, uv_c, k)
            pdf = jnp.where(cam_fsd, fsd_f_at(cam, cv, segc), pdf)
            return pdf * jnp.abs(vec.dot(segc, ns_cprev)) / dc2

        dkeys = rng.depth_key(keys, 64 + idx)

        # ---------- s=1: fresh NEE sample
        def nee_strategy():
            u_nee = rng.uniform(dkeys, rng.D_NEE, 3)
            e_n, pmf_n = _sample_emitter_by_power(et,
                                                  u_nee[:, 0] * 0.9999)
            nee = etab.sample_direct(et, geo, tables.spectra, e_n, p_c,
                                     k, u_nee)
            wo_c = sfc.to_local(nee["wo"])
            f_c, pdf_c = bsdf_dev.eval_f(tables, mat_c, wi_c, wo_c,
                                         uv_c, k)
            # FSD endpoint: scalar ASF value, polarization-preserving
            f_fsd_c = fsd_f_at(cam, cv, nee["wo"])
            f_c = jnp.where(cam_fsd[:, None, None],
                            eye4 * f_fsd_c[:, None, None], f_c)
            pdf_c = jnp.where(cam_fsd, f_fsd_c, pdf_c)
            occ = trace_mod.occluded(
                geo, p_c, nee["wo"], jnp.full((N,), eps),
                nee["dist"] - 2 * eps, jnp.full((N,), -1, jnp.int32),
                nee["tri"])
            pdf_nee = pmf_n * nee["pdf_sa"]
            M_nee, _ = compose_scatter(pol_c, pax_c, wi_c_w, f_c,
                                       -nee["wo"])
            c_nee = contrib4(M_nee, stokes_mod.unpolarized(nee["Li"])) \
                / jnp.maximum(pdf_nee, 1e-30)[:, None]
            # light side: single emitter vertex; s'=0 alternative ratio
            ssum_l = jnp.where(nee["delta_dir"], 0.0,
                               pdf_c / jnp.maximum(pdf_nee, 1e-30))
            # camera side: alternatives re-sample cv (and below) from
            # the light: emission direction pdf toward cv
            cos_on_l = jnp.abs(vec.dot(nee["wo"], nee["ln"]))
            pdf_edir = etab.pdf_emission_dir(et, e_n, nee["ln"],
                                             -nee["wo"])
            dist2 = jnp.maximum(nee["dist"], 1e-9) ** 2
            pconn_cam = pdf_edir * jnp.abs(vec.dot(nee["wo"], ns_c)) \
                / dist2
            ssum_c = _side_sum(t, pconn_cam, cam_r_end(nee["wo"]),
                               cam["pdf_fwd"], cam["delta_v"], S_cam)
            w = 1.0 / jnp.maximum(1.0 + ssum_l + ssum_c, 1.0)
            ok = cam_ok & nee["valid"] & ~occ & (pdf_nee > 0) \
                & (f_c[:, 0, 0] > 0)
            return jnp.where(ok[:, None], w[..., None] * c_nee, 0.0)

        # ---------- s>=2: connect to stored light vertex lv = j-1
        def conn_strategy():
            lv = j - 1
            s_len = j            # stored light vertices in the chain
            l_fsd = _dyn(lgt["fsd_v"], lv)
            l_ok = _dyn(lgt["valid"], lv) & ~_dyn(lgt["delta_v"], lv)
            p_l = _dyn(lgt["p"], lv)
            ns_l = _dyn(lgt["ns"], lv)
            wi_l_w = _dyn(lgt["wi"], lv)
            uv_l = _dyn(lgt["uv"], lv)
            mat_l = _dyn(lgt["mat"], lv)
            pol_l = _dyn(lgt["pol_v"], lv)
            pax_l = _dyn(lgt["pax_v"], lv)
            G, dn, dist = _geometry_term(p_c, ns_c, p_l, ns_l)
            sfl = frame_mod.build_shading_frame(ns_l, _tangent_of(ns_l))
            f_cam, pdf_cam_dir = bsdf_dev.eval_f(
                tables, mat_c, wi_c, sfc.to_local(dn), uv_c, k)
            f_lgt, pdf_lgt_dir = bsdf_dev.eval_f(
                tables, mat_l, sfl.to_local(wi_l_w), sfl.to_local(-dn),
                uv_l, k)
            # FSD endpoints: scalar ASF values in place of the surface
            # BSDF (region vertices carry no cosine either)
            f_fsd_c = fsd_f_at(cam, cv, dn)
            f_cam = jnp.where(cam_fsd[:, None, None],
                              eye4 * f_fsd_c[:, None, None], f_cam)
            pdf_cam_dir = jnp.where(cam_fsd, f_fsd_c, pdf_cam_dir)
            f_fsd_l = fsd_f_at(lgt, lv, -dn)
            f_lgt = jnp.where(l_fsd[:, None, None],
                              eye4 * f_fsd_l[:, None, None], f_lgt)
            pdf_lgt_dir = jnp.where(l_fsd, f_fsd_l, pdf_lgt_dir)
            occ2 = trace_mod.occluded(
                geo, p_c, dn, jnp.full((N,), eps), dist - 2 * eps,
                jnp.full((N,), -1, jnp.int32),
                jnp.full((N,), -1, jnp.int32))
            cos_c = jnp.where(cam_fsd, 1.0,
                              jnp.maximum(jnp.abs(vec.dot(dn, ns_c)),
                                          1e-7))
            cos_l = jnp.where(l_fsd, 1.0,
                              jnp.maximum(jnp.abs(vec.dot(dn, ns_l)),
                                          1e-7))
            d_in_l = -wi_l_w
            s_ax_l = _safe_cross(d_in_l, -dn)
            S_rot = stokes_mod.reorient(pol_l, pax_l, s_ax_l, d_in_l)
            S1 = jnp.einsum("nij,nj->ni", f_lgt, S_rot)
            M_conn, x_in = compose_scatter(pol_c, pax_c, wi_c_w, f_cam,
                                           -dn)
            S2 = stokes_mod.reorient(S1, s_ax_l, x_in, -dn)
            d2 = jnp.maximum(dist, 1e-9) ** 2
            # the Mueller-valued BSDFs carry their own cosines; the
            # connection geometry reduces to 1/d² (FSD region vertices
            # included — they have no surface cosine at all)
            geom = 1.0 / d2
            c_conn = contrib4(M_conn, S2) * geom[:, None]
            pconn_cam = pdf_lgt_dir * cos_c / d2
            pconn_lgt = pdf_cam_dir * cos_l / d2
            # light-side endpoint remap: pdf of lgt[lv-1] from lv given
            # incoming -dn
            p_lprev = _dyn(lgt["p"], lv - 1)
            ns_lprev = _dyn(lgt["ns"], lv - 1)
            segl = p_lprev - p_l
            dl2 = jnp.maximum(vec.length2(segl), 1e-18)
            segl = segl / jnp.sqrt(dl2)[:, None]
            _, pdf_l_rev = bsdf_dev.eval_f(tables, mat_l,
                                           sfl.to_local(-dn),
                                           sfl.to_local(wi_l_w), uv_l, k)
            pdf_l_rev = jnp.where(l_fsd, fsd_f_at(lgt, lv, segl),
                                  pdf_l_rev)
            r_end_l = pdf_l_rev * jnp.abs(vec.dot(segl, ns_lprev)) / dl2
            ssum_c = _side_sum(t, pconn_cam, cam_r_end(dn),
                               cam["pdf_fwd"], cam["delta_v"], S_cam)
            ssum_l = _side_sum(s_len, pconn_lgt, r_end_l,
                               lgt["pdf_fwd"], lgt["delta_v"], S_lgt,
                               F_lgt, bot_light)
            w = 1.0 / jnp.maximum(1.0 + ssum_c + ssum_l, 1.0)
            ok = cam_ok & l_ok & ~occ2 & (c_conn[:, 0] > 0)
            return jnp.where(ok[:, None], w[..., None] * c_conn, 0.0)

        dL = jnp.where(j == 0, nee_strategy(), conn_strategy())
        d_conn = d_conn.at[idx].add(dL[:, 0].sum())
        return L + dL, d_conn

    L, dbg["conn"] = jax.lax.fori_loop(0, S * (T + 1), conn_body,
                                       (L, dbg["conn"]))

    # ---- t=1: light tracing onto the sensor — EVERY stored light
    # vertex splats, weighted by the full MIS (the camera subpath is the
    # bare pinhole; alternatives live entirely on the light chain)
    ro_cam = jnp.broadcast_to(
        jnp.asarray(sensor.camera_basis()[0], jnp.float32), (N, 3))

    def lt_body(lv, carry):
        lt_pos, lt_val, lt_ok = carry
        s_len = lv + 1
        p_l = _dyn(lgt["p"], lv)
        ns_l = _dyn(lgt["ns"], lv)
        wi_l_w = _dyn(lgt["wi"], lv)
        uv_l = _dyn(lgt["uv"], lv)
        mat_l = _dyn(lgt["mat"], lv)
        pol_l = _dyn(lgt["pol_v"], lv)
        pax_l = _dyn(lgt["pax_v"], lv)
        l_fsd = _dyn(lgt["fsd_v"], lv)
        pxy_l, visible, cosz, dn_cam, dist_c = sensor.project(p_l)
        sfl = frame_mod.build_shading_frame(ns_l, _tangent_of(ns_l))
        f_l, _ = bsdf_dev.eval_f(tables, mat_l, sfl.to_local(wi_l_w),
                                 sfl.to_local(-dn_cam), uv_l, k)
        f_fsd_l = fsd_f_at(lgt, lv, -dn_cam)
        f_l = jnp.where(l_fsd[:, None, None],
                        eye4 * f_fsd_l[:, None, None], f_l)
        occ3 = trace_mod.occluded(
            geo, ro_cam, dn_cam, jnp.full((N,), eps), dist_c - 2 * eps,
            jnp.full((N,), -1, jnp.int32), jnp.full((N,), -1, jnp.int32))
        # importance with the pixel choice folded into the direction pdf
        # (every strategy assumes n = spp·npix samples): the splat value
        # is β·f/(A_img·cosz³·d²), developed by /spp — this makes the
        # light image consistent with the backward per-pixel estimator
        W_cam = 1.0 / (A_img * jnp.maximum(cosz, 1e-3) ** 3)
        d_in_l = -wi_l_w
        s_ax_l = _safe_cross(d_in_l, -dn_cam)
        S_rot = stokes_mod.reorient(pol_l, pax_l, s_ax_l, d_in_l)
        S1 = jnp.einsum("nij,nj->ni", f_l, S_rot)
        d2c = jnp.maximum(dist_c, 1e-9) ** 2
        val = S1 * (W_cam / d2c)[:, None]
        # endpoint-remapped bottom alternatives for the tau==1 chain:
        # the alternative path "camera → v0 → BSDF-hits the emitter"
        # arrives at v0 along the CAMERA direction, not the stored
        # chain's continuation. With the stored direction (the global
        # bot_light), a near-specular v0 whose camera-aligned lobe
        # points at the emitter contributes an invisible alternative —
        # w stays ~1 and the t=1 highlight splats double-count the
        # emitter energy (measured: bdpt/path 1.57 on veach_mis, whose
        # glossy plates are exactly this configuration; diffuse scenes
        # are direction-independent and unaffected).
        _, pdf_em_cam = bsdf_dev.eval_f(
            tables, mat_l, sfl.to_local(-dn_cam), sfl.to_local(dir0),
            uv_l, k)
        r_hit_cam = jnp.where(
            (et.etype[jnp.maximum(e0, 0)] == etab.ET_AREA)
            & (cos_e0 > 1e-6) & (pdf_nee_sa0 > 0),
            pdf_em_cam / jnp.maximum(pdf_nee_sa0, 1e-30), 0.0)
        bot_l = jnp.where(lv == 0,
                          (pdf_em_cam > 0).astype(jnp.float32)
                          * r_hit_cam, bot_light)
        # MIS: re-sample the light chain from the camera side
        cos_l = jnp.where(l_fsd, 1.0,
                          jnp.maximum(jnp.abs(vec.dot(dn_cam, ns_l)),
                                      1e-7))
        p_camdir = 1.0 / (A_img * jnp.maximum(cosz, 1e-3) ** 3)
        pconn_lgt = p_camdir * cos_l / d2c
        p_lprev = _dyn(lgt["p"], lv - 1)
        ns_lprev = _dyn(lgt["ns"], lv - 1)
        segl = p_lprev - p_l
        dl2 = jnp.maximum(vec.length2(segl), 1e-18)
        segl = segl / jnp.sqrt(dl2)[:, None]
        _, pdf_l_rev = bsdf_dev.eval_f(tables, mat_l,
                                       sfl.to_local(-dn_cam),
                                       sfl.to_local(wi_l_w), uv_l, k)
        pdf_l_rev = jnp.where(l_fsd, fsd_f_at(lgt, lv, segl), pdf_l_rev)
        r_end_l = pdf_l_rev * jnp.abs(vec.dot(segl, ns_lprev)) / dl2
        ssum_l = _side_sum(s_len, pconn_lgt, r_end_l, lgt["pdf_fwd"],
                           lgt["delta_v"], S_lgt, F_lgt, bot_l)
        w = 1.0 / jnp.maximum(1.0 + ssum_l, 1.0)
        ok = _dyn(lgt["valid"], lv) & ~_dyn(lgt["delta_v"], lv) \
            & visible & ~occ3 & (val[:, 0] > 0)
        val = val * w[:, None]
        lt_pos = jax.lax.dynamic_update_index_in_dim(
            lt_pos, pxy_l, lv, axis=1)
        lt_val = jax.lax.dynamic_update_index_in_dim(
            lt_val, val, lv, axis=1)
        lt_ok = jax.lax.dynamic_update_index_in_dim(lt_ok, ok, lv,
                                                    axis=1)
        return lt_pos, lt_val, lt_ok

    lt_pos = jnp.zeros((N, T, 2))
    lt_val = jnp.zeros((N, T, 4))
    lt_ok = jnp.zeros((N, T), bool)
    lt_pos, lt_val, lt_ok = jax.lax.fori_loop(
        0, T, lt_body, (lt_pos, lt_val, lt_ok))

    splat_pos = pixel_xy.astype(jnp.float32) + jitter
    Lw = L * w_spectral[:, None]
    ltw = lt_val * w_spectral[:, None, None]
    npix = sensor.width * sensor.height
    if polarimetric:
        values = (Lw[:, None, :] * sens[..., None]).reshape(N, -1)
        lt_values = (ltw[:, :, None, :]
                     * sens[:, None, :, None]).reshape(N, T, -1)
    else:
        values = Lw[:, 0:1] * sens
        lt_values = ltw[..., 0:1] * sens[:, None, :]
    Cl = lt_values.shape[-1]
    del npix  # pixel count lives inside the camera pdf convention
    out = (splat_pos, values, jnp.ones((N,), bool),
           (lt_pos.reshape(N * T, 2),
            lt_values.reshape(N * T, Cl),
            lt_ok.reshape(N * T)))
    if with_stats:
        # both walks' counters + the connection/NEE/t=1 shadow rays —
        # every (s,t) pair and every stored light vertex casts one
        # occlusion segment per lane (reference stats.hpp:19-84)
        stats = cam["stats"] + lgt["stats"]
        n_shadow = float(S * (T + 1) + T) * jnp.asarray(N, jnp.float32)
        stats = stats.at[STAT_SHADOW].add(n_shadow)
        out = out + (stats,)
    if debug_buckets:
        # raw pre-spectral-weight sums, same units as the s0/conn buckets
        dbg["t1"] = jnp.sum(
            jnp.where(lt_ok[..., None], lt_val[..., 0:1], 0.0),
            axis=(0, 2))
        return out + (dbg,)
    return out


def _ph(a, b):
    a2 = a * a
    return a2 / jnp.maximum(a2 + b * b, 1e-30)


def _tangent_of(n):
    return frame_mod.build_orthogonal_frame(n).t


def _emitter_area_pdf(et, emitter_id):
    eid = jnp.maximum(emitter_id, 0)
    tot = jnp.maximum(et.power.sum(), 1e-30)
    pmf = et.power[eid] / tot
    pdf_a = 1.0 / jnp.maximum(et.area_total[eid], 1e-30)
    return jnp.where((emitter_id >= 0)
                     & (et.etype[eid] == etab.ET_AREA), pmf * pdf_a, 0.0)
