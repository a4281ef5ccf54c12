"""plt_path forward transport — light tracing onto virtual sensors.

Reference include/wt/integrator/plt_path/plt_path_detail.hpp:804-828
(integrate_forward), :513-540 (sensing) and :469-510 (nee_forward): beams
start at emitters; when a segment sweeps past a virtual coverage sensor
the beam is connected directly onto the sensor element (`Si`), and every
free-space-diffraction aperture additionally makes an explicit FSD-NEE
connection to a sampled sensor point, both through the thread-safe
light-image splat path. The deferred free-space-diffraction carry
modulates each connection with the coherent per-edge UTD sum — this is
where interference fringes (double-slit) and multipath fading (coverage
maps) appear.

Transport is polarimetric: forward beams carry a full Stokes vector with
its transverse frame (reference beam.hpp:31-248 forward beams carry
stokes_parameters_t); surface scatters apply the frame-aware Mueller
operator. The deferred coherent UTD sum is applied as a scalar intensity
factor on the Stokes vector (the reference resolves it into the edge S/P
basis per connection — documented approximation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wave_tracer_tpu.accel import edges as edges_mod
from wave_tracer_tpu.accel import trace as trace_mod
from wave_tracer_tpu.bsdf import device as bsdf_dev
from wave_tracer_tpu.emitter import table as etab
from wave_tracer_tpu.integrator.path import (_perp_axis,
                                             _sample_emitter_by_power)
from wave_tracer_tpu.math import frame as frame_mod
from wave_tracer_tpu.math import vec
from wave_tracer_tpu.polarization import stokes
from wave_tracer_tpu.sampling import rng
from wave_tracer_tpu.wave import beam as beam_geo
from wave_tracer_tpu.wave import envelope as env_mod
from wave_tracer_tpu.wave import fraunhofer as fr
from wave_tracer_tpu.wave import fsd as fsd_mod
from wave_tracer_tpu.wave import sourcing

BIG = 1e30
Z_SCALE = 2.0


def forward_scatter(S, xf, d_in, d_out, Mw):
    """Apply a BSDF Mueller operator to a forward Stokes vector.

    Mw is expressed in the S/P basis of the scattering plane (d_in,
    d_out); S is given w.r.t. transverse axis xf ⊥ d_in. Returns
    (S', xf') with xf' the scattering-plane s-axis (⊥ d_out too) —
    the forward counterpart of path.compose_scatter (reference
    mueller.hpp M(S, frames...))."""
    s_axis = jnp.cross(d_in, d_out)
    slen = jnp.linalg.norm(s_axis, axis=-1, keepdims=True)
    degen = slen[..., 0] < 1e-7
    s_axis = jnp.where(degen[..., None], _perp_axis(d_in),
                       s_axis / jnp.maximum(slen, 1e-12))
    S_in = stokes.reorient(S, xf, s_axis, d_in)
    S_out = jnp.einsum("nij,nj->ni", Mw, S_in)
    return S_out, s_axis


def trace_forward(data, lane_ids, base_key, sample_ids, *, sensor,
                  edge_table, max_depth: int = 8, rr_depth: int = 3,
                  rr_floor: float = 0.5, eps: float = 1e-5,
                  fsd: bool = True, K: int = 8, fsd_mode: str = "utd",
                  debug: bool = False):
    """Forward light-trace batch.

    Each lane emits one beam and records its first virtual-plane crossing
    (beams rarely cross the plane twice; the carried accumulator keeps the
    first) plus one FSD-NEE connection per bounce. Returns
    (splat_pos (N, 2), values (N, C), valid, sig (N,),
     (nee_pos (N·D, 2), nee_val (N·D, C), nee_ok (N·D,))) for the
    direct-splat film path.

    fsd_mode selects the diffraction model: "utd" — the plt_path deferred
    coherent UTD carry (reference plt_path_detail.hpp:591-610);
    "fraunhofer" — the plt_bdpt-style Fraunhofer ASF interaction
    (reference plt_bdpt_detail.hpp:286-346): the coherent interference is
    baked into the sampled scatter directions, so crossings splat the
    plain beam weight. This is the reference's t=0 connection strategy
    for virtual sensors under plt_bdpt (plt_bdpt_detail.hpp:784-816).
    """
    geo = data.geo
    tables = data.tables
    et = data.emitters
    sp = data.spectral
    N = lane_ids.shape[0]
    utd = fsd_mode != "fraunhofer"
    polarimetric = bool(getattr(sensor, "polarimetric", False))

    keys = rng.sample_key(base_key, lane_ids, sample_ids)

    # spectral + emitter sampling (joint)
    u_spec = rng.uniform(keys, rng.D_SPECTRUM, 2)
    e0, pmf_e = sp.sample_emitter(u_spec[:, 0])
    k, pdf_k = sp.sample_k(e0, u_spec[:, 1])
    # joint: emitter pmf × its spectral density (forward samples keep the
    # emitter they drew)
    w_spectral = 1.0 / jnp.maximum(pmf_e * pdf_k, 1e-30)

    # emission beam
    u_em = jnp.concatenate([rng.uniform(keys, rng.D_EMITTER_POS, 3),
                            rng.uniform(keys, rng.D_EMITTER_DIR, 1)],
                           axis=-1)
    em = etab.sample_emission(et, geo, tables.spectra, e0, k, u_em)
    W_sens = sensor.importance()
    plane_o, plane_xa, plane_ya, plane_n = [
        jnp.asarray(v, jnp.float32) for v in sensor.plane_basis()]
    plane_area = float(sensor.extent[0] * sensor.extent[1])

    # beam envelope sourcing from the emitter's phase-space scale
    # (unified sourcing_geometry_t, wave/sourcing.py)
    se_mub, ta_mub = sourcing.source_emitter_mub(et, e0, k)
    x0_0 = jnp.sqrt(jnp.maximum(se_mub, 0.0))

    D = max_depth
    state = dict(
        ro=em["y"], rd=em["wo"],
        S=stokes.unpolarized(em["weight"] * w_spectral),  # (N, 4)
        xf=_perp_axis(em["wo"]),
        acc=jnp.zeros((N, 4), jnp.float32),     # crossing Stokes splat
        pos=jnp.zeros((N, 2), jnp.float32),     # splat element position
        sig=jnp.full((N,), 0.25, jnp.float32),  # splat σ in elements
        hit_plane=jnp.zeros((N,), bool),
        active=em["valid"],
        exclude=jnp.full((N,), -1, jnp.int32),
        # full elliptic envelope (reference beam.hpp); sourced isotropic
        env=env_mod.EnvState(x=_perp_axis(em["wo"]), x0=x0_0, ta=ta_mub,
                             e=jnp.ones((N,), jnp.float32)),
        fsd_ap=fsd_mod.empty_aperture(N, K),
        fsd_valid=jnp.zeros((N,), bool),
        sampled_fsd=jnp.zeros((N,), bool),
        # path length since the last REAL scatter (null restarts move
        # the origin without a physical event): the incident wavefront
        # curvature radius at the next interaction
        dist_src=jnp.zeros((N,), jnp.float32),
        prev_vert=em["y"],
        S_prev=jnp.zeros((N, 4), jnp.float32),
        # FSD-NEE records, one per depth (nee_forward,
        # plt_path_detail.hpp:469-510)
        nee_pos=jnp.zeros((N, D, 2), jnp.float32),
        nee_val=jnp.zeros((N, D, 4), jnp.float32),
        nee_ok=jnp.zeros((N, D), bool),
    )

    def fsd_legs(ap, ev, src, dst, hit_tri, src_tri=None):
        """Shadow-segment block for one coherent-sum evaluation:
        (a_pts, b_pts, ex1, ex2, ex3) of 2K+1 segments per lane. Both
        edge legs exclude the aperture edge's adjacent faces (they start
        or end ON the edge — rounding-robust visibility, cf.
        fsd.aperture_face_tris); dst-side legs exclude the hit tri and
        src-side legs the surface the segment starts on."""
        if src_tri is None:
            src_tri = jnp.full((N,), -1, jnp.int32)
        src_e = jnp.broadcast_to(src[:, None, :], (N, K, 3))
        dst_e = jnp.broadcast_to(dst[:, None, :], (N, K, 3))
        a_pts = jnp.concatenate([src_e.reshape(-1, 3),
                                 ev["p"].reshape(-1, 3), src], axis=0)
        b_pts = jnp.concatenate([ev["p"].reshape(-1, 3),
                                 dst_e.reshape(-1, 3), dst], axis=0)
        et1, et2 = fsd_mod.aperture_face_tris(edge_table, ap)
        ex1 = jnp.concatenate([
            et1.reshape(-1), et1.reshape(-1), src_tri], axis=0)
        ex2 = jnp.concatenate([
            et2.reshape(-1), et2.reshape(-1), hit_tri], axis=0)
        ex3 = jnp.concatenate([
            jnp.broadcast_to(src_tri[:, None], (N, K)).reshape(-1),
            jnp.broadcast_to(hit_tri[:, None], (N, K)).reshape(-1),
            jnp.full((N,), -1, jnp.int32)], axis=0)
        return a_pts, b_pts, ex1, ex2, ex3

    def coherent_f(ev, occ_block, src, dst, ap_valid):
        """Coherent UTD intensity for one evaluation given its occlusion
        slice (2K+1 segments per lane)."""
        s1 = occ_block[:N * K].reshape(N, K)
        s2 = occ_block[N * K:2 * N * K].reshape(N, K)
        occ_direct = occ_block[2 * N * K:]
        unshadowed = ~s1 & ~s2
        direct_vis = ap_valid & ~occ_direct
        ts, th = fsd_mod.coherent_sum(ev, k, src, dst, direct_vis,
                                      unshadowed)
        f = fsd_mod.fsd_intensity(ts, th)
        return jnp.where(ap_valid & jnp.isfinite(f), f, 1.0)

    def body(depth, st):
        dkeys = rng.depth_key(keys, depth)

        t, tri, u, v = trace_mod.trace(geo, st["ro"], st["rd"],
                                       jnp.full((N,), eps),
                                       jnp.full((N,), BIG), st["exclude"])
        hit = trace_mod.hit_attributes(geo, st["ro"], st["rd"], t, tri, u,
                                       v)
        lane = st["active"]
        seg_end = jnp.where(hit.valid, hit.t, BIG)

        env = st["env"]
        # ---- edge sweep (conservative major-axis radius)
        zmax = jnp.where(hit.valid, hit.t * 1.02 + env.x0,
                         8.0 * data.emitters.scene_radius)
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
        z_first = jnp.where(have_edges, jnp.min(ez, axis=1), BIG)
        fp_hit = env.major(jnp.where(hit.valid, hit.t, 0.0))
        delta_hit = jnp.maximum(Z_SCALE * fp_hit, 4.0 * eps)
        hit_ok = lane & hit.valid
        midflight = have_edges & (z_first < jnp.where(
            hit.valid, hit.t - delta_hit, BIG))
        surface = hit_ok & ~midflight
        z_int = jnp.where(surface, hit.t, z_first)
        has_interaction = lane & (surface | midflight)
        wp = st["ro"] + z_int[:, None] * st["rd"]
        fp_int = env.major(z_int)

        # ---- sensing geometry: does this segment cross the plane?
        tpl, pxy, inside, cos_in = sensor.intersect(st["ro"], st["rd"])
        crosses = lane & inside & (tpl > eps) \
            & (tpl < jnp.minimum(seg_end, z_int + delta_hit)) \
            & (cos_in > 0)
        plane_p = st["ro"] + tpl[:, None] * st["rd"]

        # ---- aperture for this interaction (needed by FSD-NEE below)
        if fsd and utd:
            ap_now = fsd_mod.build_aperture(
                edge_table, eidx, wp, -st["rd"], Z_SCALE * fp_int)
        else:
            ap_now = fsd_mod.empty_aperture(N, K)

        # ---- FSD-NEE target: a sampled sensor point (reference
        # virtual_plane sample_direct, virtual_plane_sensor.cpp:136-160)
        u_sn = rng.uniform(dkeys, rng.D_SENSOR, 2)
        sp_pt, sp_pxy, _, _ = sensor.sample_point(u_sn)
        nee_dir = sp_pt - wp
        nee_dist = vec.safe_length(nee_dir)
        nee_dirn = nee_dir / jnp.maximum(nee_dist, 1e-20)[:, None]
        nee_cos = -vec.dot(nee_dirn, jnp.broadcast_to(plane_n, (N, 3)))

        # ---- ALL coherent-sum shadow segments batched into ONE
        # traversal: (a) crossing modulation, (b) continuing-beam
        # modulation, (c) FSD-NEE through the new aperture
        if fsd and utd:
            dst_seg = jnp.where(has_interaction[:, None], wp,
                                st["ro"] + (4.0 * data.emitters.
                                            scene_radius) * st["rd"])
            ev_cross = fsd_mod.fsd_eval(st["fsd_ap"], k, st["prev_vert"],
                                        plane_p)
            ev_cont = fsd_mod.fsd_eval(st["fsd_ap"], k, st["prev_vert"],
                                       dst_seg)
            ev_nee = fsd_mod.fsd_eval(ap_now, k, st["ro"], sp_pt)
            blocks = [fsd_legs(st["fsd_ap"], ev_cross, st["prev_vert"],
                               plane_p, hit.tri),
                      fsd_legs(st["fsd_ap"], ev_cont, st["prev_vert"],
                               dst_seg, hit.tri),
                      fsd_legs(ap_now, ev_nee, st["ro"], sp_pt,
                               jnp.full((N,), -1, jnp.int32),
                               src_tri=st["exclude"])]
            a_all = jnp.concatenate([b[0] for b in blocks], axis=0)
            b_all = jnp.concatenate([b[1] for b in blocks], axis=0)
            ex1_all = jnp.concatenate([b[2] for b in blocks], axis=0)
            ex2_all = jnp.concatenate([b[3] for b in blocks], axis=0)
            ex3_all = jnp.concatenate([b[4] for b in blocks], axis=0)
            seg = b_all - a_all
            seg_d = vec.safe_length(seg)
            seg_n = seg / jnp.maximum(seg_d, 1e-20)[:, None]
            occ_all = trace_mod.occluded(
                geo, a_all, seg_n, jnp.full((a_all.shape[0],), eps),
                seg_d - 2.0 * eps, ex1_all, ex2_all, ex3_all)
            M = N * (2 * K + 1)
            f_cross = coherent_f(ev_cross, occ_all[:M], st["prev_vert"],
                                 plane_p, st["fsd_valid"])
            f_cont = coherent_f(ev_cont, occ_all[M:2 * M],
                                st["prev_vert"], dst_seg,
                                st["fsd_valid"])
            ap_nee_ok = ap_now.any_valid()
            f_nee = coherent_f(ev_nee, occ_all[2 * M:], st["ro"], sp_pt,
                               ap_nee_ok)
        else:
            f_cross = jnp.ones((N,))
            f_cont = jnp.ones((N,))
            f_nee = jnp.zeros((N,))
            ap_nee_ok = jnp.zeros((N,), bool)

        def deferred(Scur, Sprev, f):
            """Two-beam deferred superposition (plt_path_detail:591-610)."""
            return jnp.where(
                st["fsd_valid"][:, None],
                jnp.where(st["sampled_fsd"][:, None],
                          Scur * f[:, None], Scur + Sprev * f[:, None]),
                Scur)

        # ---- crossing splat (first crossing per lane)
        S_cross = deferred(st["S"], st["S_prev"], f_cross)
        # reorient into the plane's transverse frame for Q/U consistency
        px_perp = plane_xa - vec.dot(plane_xa, st["rd"])[:, None] \
            * st["rd"]
        px_perp = vec.normalize(px_perp, eps=1e-12)
        S_cross = stokes.reorient(S_cross, st["xf"], px_perp, st["rd"])
        contrib = S_cross * W_sens
        newly = crosses & ~st["hit_plane"]
        elem_m = sensor.extent[0] / sensor.width
        # anisotropy-aware: isotropic-equivalent radius sqrt(major*minor)
        fp_pl = env.area_radius(tpl)
        sig_el = (fp_pl / 3.0) / elem_m
        acc = jnp.where(newly[:, None], contrib, st["acc"])
        pos = jnp.where(newly[:, None], pxy, st["pos"])
        sig = jnp.where(newly, sig_el, st["sig"])
        hit_plane = st["hit_plane"] | crosses

        # ---- FSD-NEE splat (reference nee_forward: connection weight
        # W·f·A/dist², visibility inside the coherent sum). The
        # connection FADES with the aperture's strongest boundary
        # window (wave/fsd.py FsdAperture.w): an aperture holding only
        # envelope-grazing edges contributes ~nothing, so the discrete
        # any_valid() gate flipping under cross-lowering rounding no
        # longer produces O(1) splat changes (measured 1.6% of legs
        # before this fade; see test_gradients_wave cross-lowering
        # bound).
        if fsd and utd:
            ap_w_max = jnp.max(jnp.where(ap_now.valid, ap_now.w, 0.0),
                               axis=1)
        else:
            ap_w_max = jnp.zeros((N,))
        S_int = deferred(st["S"], st["S_prev"], f_cont)
        nee_w = f_nee * W_sens * plane_area * jnp.minimum(ap_w_max, 1.0) \
            / jnp.maximum(nee_dist * nee_dist, 1e-12)
        nx_perp = plane_xa - vec.dot(plane_xa, nee_dirn)[:, None] \
            * nee_dirn
        nx_perp = vec.normalize(nx_perp, eps=1e-12)
        S_nee = stokes.reorient(S_int, st["xf"], nx_perp, nee_dirn) \
            * nee_w[:, None]
        ok_nee = has_interaction & ap_nee_ok & (nee_cos > 0) \
            & (f_nee > 0) & jnp.isfinite(nee_w) & jnp.asarray(fsd & utd)
        nee_pos = st["nee_pos"].at[:, depth].set(sp_pxy)
        nee_val = st["nee_val"].at[:, depth].set(
            jnp.where(ok_nee[:, None], S_nee, 0.0))
        nee_ok = st["nee_ok"].at[:, depth].set(ok_nee)

        # ---- surface interaction (frame-aware Mueller on the Stokes)
        sf = frame_mod.build_shading_frame(hit.ns, hit.dpdu)
        sf = bsdf_dev.apply_normalmap(tables, hit.mat_id, hit.uv, k, sf)
        wi_l = sf.to_local(-st["rd"])
        u_b = jnp.concatenate([
            rng.uniform(dkeys, rng.D_BSDF_LOBE, 2),
            rng.uniform(dkeys, rng.D_BSDF_DIR, 2)], axis=-1)
        bs = bsdf_dev.sample(tables, hit.mat_id, wi_l, hit.uv, k, u_b)
        wo_surface = sf.to_world(bs.wo)
        S_surf, xf_surf = forward_scatter(S_int, st["xf"], st["rd"],
                                          wo_surface, bs.Mw)
        # new elliptic envelope through the projected footprint ellipse
        env_surf, _sid = env_mod.surface_scatter(
            env, st["rd"], z_int, hit.geo_n, wo_surface, bs.specular, k)

        # ---- FSD interaction
        if fsd and utd:
            u_fsd = jnp.concatenate(
                [rng.uniform(dkeys, rng.D_FSD, 2),
                 rng.uniform(dkeys, rng.D_PHASE, 2)], axis=-1)
            fsmp = fsd_mod.fsd_sample(ap_now, k, st["ro"], wp, u_fsd)
            w_fsd_scale = jnp.where(
                fsmp["is_direct"],
                (ap_now.count() + 1).astype(jnp.float32),
                1.0 / jnp.maximum(fsmp["pdf"], 1e-20))
            fsd_lane = midflight & fsmp["valid"]
        elif fsd:
            # Fraunhofer ASF interaction (plt_bdpt_detail.hpp:286-346):
            # direction ~ coherent ASF, and the continuation carries
            # only the UNOBSTRUCTED wavefront fraction I = 1 − ∫wavefront
            # over region triangles (find_closest_triangle integrate_
            # tris, :353-419) — the blocked portion belongs to the
            # surface-hit partition. Without this the full beam power
            # re-radiates through the aperture and the absolute fringe
            # level comes out ~8x high (validated against a numerical
            # Fresnel–Kirchhoff oracle, tests/test_calibration.py).
            from wave_tracer_tpu.integrator.plt_bdpt import _blocked_flux
            # more RIS proposals than the bdpt walks use: the t=0
            # crossings ARE the image here, so the winner distribution
            # must resolve the ASF's interference fringes
            M_RIS = 32
            sigma = jnp.maximum(fp_int, 1e-9) / beam_geo.ENVELOPE
            fx = _perp_axis(st["rd"])
            fy = jnp.cross(st["rd"], fx)
            # wavefront quadratic phase: incident spherical curvature
            # (R = path length since the last real scatter — the
            # source, for direct illumination) plus the finite
            # sensing-plane distance L (the lens-less Fourier
            # configuration). This pins the fringe positions of every
            # beam of the source cone to the same absolute location —
            # without it each beam's pattern shifts by ~(R+L)·tilt and
            # the ensemble fills the fringe minima (build_aperture_3d
            # docstring; validated by the Kirchhoff dip bands).
            R_src = jnp.maximum(st["dist_src"] + z_int,
                                4.0 * jnp.maximum(fp_int, 1e-9))
            L_det = tpl - z_int
            inv_L = jnp.where(inside & (L_det > 1e-6), 1.0 / L_det, 0.0)
            curv = 0.5 * k * (1.0 / R_src + inv_L)
            fap, scale = fr.build_aperture_3d(
                edge_table, eidx, wp, st["rd"], fx, fy, sigma,
                jnp.maximum(fp_int, 1e-9), k, curv=curv)
            dz_bf = jnp.maximum(Z_SCALE * fp_int, 4.0 * eps)
            blocked = _blocked_flux(
                geo, st["ro"], st["rd"], fx, fy, z_int, dz_bf,
                env.x0, env.ta, sigma,
                tri_clusters=getattr(data, "tri_clusters", None))
            uR = rng.uniform(dkeys, rng.D_FSD, 4 * M_RIS + 2)
            xi, asf_v, w_ris, vs = fr.sample_xi_sir(
                fap, uR[:, :4 * M_RIS].reshape(N, M_RIS, 4),
                uR[:, 4 * M_RIS])
            wo_l, ok_wo = fr.xi_to_wo(xi, scale)
            wo_fr = wo_l[:, 0:1] * fx + wo_l[:, 1:2] * fy \
                + wo_l[:, 2:3] * st["rd"]
            fsmp = dict(wo=wo_fr, p=wp,
                        is_direct=jnp.zeros((N,), bool),
                        pdf=jnp.ones((N,)),
                        valid=jnp.any(fap.valid, axis=1) & vs & ok_wo)
            # Weight semantics: the RIS winner at M=32 is treated as
            # ASF-distributed with DETERMINISTIC weight (1 − blocked) —
            # the reference's SIR weight-1 convention
            # (fsd_sampler.cpp:105-110) times the blocked-flux partition
            # (only the unobstructed wavefront fraction continues,
            # find_closest_triangle integrate_tris, plt_bdpt_detail.hpp:
            # 353-419). The fully-unbiased alternative
            # w_ris/aperture.total was measured to firefly: the weight
            # tail compounds over the 16-deep bounce chain (single
            # texels captured 30% of the film). Resampling bias decays
            # with M; weight variance is zero. Fringe structure comes
            # from the winner's ASF-ness (measure-consistent asf(),
            # wave/fraunhofer.py), validated against a numerical
            # Fresnel–Kirchhoff oracle (tests/test_calibration.py).
            #
            # Flux-consistent partition (IMPROVES on the reference,
            # whose find_closest_triangle partitions by where the beam
            # AXIS lands, plt_bdpt_detail.hpp:494-512 — its weight-1
            # FSD convention makes the transmitted power follow the
            # emitter-cone aiming distribution instead of the wavefront
            # mass): a lane whose central ray hits a region triangle
            # branches stochastically — with probability (1 − blocked)
            # it redirects through the same ASF at FULL weight, else it
            # takes the surface event at full weight. Together with the
            # deterministic (1 − blocked) carried by axis-through-open
            # lanes the ensemble transmits exactly E[1 − blocked] per
            # beam, matching the Kirchhoff oracle's Gaussian open-mass
            # (validated in tests/test_calibration.py).
            redirect_surf = surface & have_edges & fsmp["valid"] \
                & (uR[:, 4 * M_RIS + 1] >= blocked)
            w_fsd_scale = jnp.where(redirect_surf, 1.0, 1.0 - blocked)
            fsd_lane = (midflight & fsmp["valid"]) | redirect_surf
        else:
            fsmp = dict(wo=st["rd"], p=wp,
                        is_direct=jnp.ones((N,), bool),
                        pdf=jnp.ones((N,)),
                        valid=jnp.zeros((N,), bool))
            w_fsd_scale = jnp.ones((N,))
            fsd_lane = jnp.zeros((N,), bool)

        null_lane = midflight & ~fsd_lane
        # surface lanes branched into the FSD redirect leave the
        # surface partition entirely (full weight rides the redirect)
        surface_eff = surface & ~fsd_lane

        ro_new = jnp.where(surface_eff[:, None], hit.p,
                           jnp.where(fsd_lane[:, None], fsmp["p"], wp))
        rd_new = jnp.where(surface_eff[:, None], wo_surface,
                           jnp.where(fsd_lane[:, None], fsmp["wo"],
                                     st["rd"]))
        S_new = jnp.where(
            surface_eff[:, None], S_surf,
            S_int * jnp.where(fsd_lane, w_fsd_scale, 1.0)[:, None])
        xf_new = jnp.where(surface_eff[:, None], xf_surf,
                           jnp.where(fsd_lane[:, None],
                                     _perp_axis(rd_new), st["xf"]))
        exclude_new = jnp.where(surface, hit.tri, st["exclude"])
        env_fsd = sourcing.restart_envelope(rd_new, fp_int, k)
        env_null = env_mod.EnvState(x=env.x, x0=fp_int, ta=env.ta,
                                    e=env.e)
        env_new = env_mod.select(
            surface_eff, env_surf, env_mod.select(fsd_lane, env_fsd,
                                                  env_null))

        fsd_valid_new = jnp.asarray(fsd) & has_interaction \
            & ap_now.any_valid()

        u_rr = rng.uniform(dkeys, rng.D_RR)
        I_new = jnp.abs(S_new[:, 0])
        q = jnp.clip(I_new / jnp.maximum(jnp.abs(st["S"][:, 0]), 1e-30),
                     rr_floor, 1.0)
        do_rr = (depth >= rr_depth) & ~null_lane
        survive = jnp.where(do_rr, u_rr < q, True)
        S_new = S_new / jnp.where(do_rr, q, 1.0)[:, None]

        cont = (surface_eff & bs.valid) | fsd_lane | null_lane
        active = lane & cont & survive & (jnp.abs(S_new[:, 0]) > 1e-25) \
            & jnp.isfinite(S_new[:, 0])

        def sel(new, old):
            br = active
            for _ in range(new.ndim - 1):
                br = br[..., None]
            return jnp.where(br, new, old)

        return dict(
            ro=sel(ro_new, st["ro"]), rd=sel(rd_new, st["rd"]),
            S=sel(S_new, st["S"]), xf=sel(xf_new, st["xf"]),
            acc=acc, pos=pos, sig=sig, hit_plane=hit_plane,
            active=active,
            exclude=sel(exclude_new, st["exclude"]),
            env=env_mod.select(active, env_new, st["env"]),
            fsd_ap=jax.tree.map(
                lambda n, o: jnp.where(
                    active.reshape(active.shape + (1,) * (n.ndim - 1)),
                    n, o), ap_now, st["fsd_ap"]),
            fsd_valid=active & fsd_valid_new,
            sampled_fsd=sel(fsd_lane, st["sampled_fsd"]),
            dist_src=sel(jnp.where(null_lane,
                                   st["dist_src"] + z_int, 0.0),
                         st["dist_src"]),
            prev_vert=sel(st["ro"], st["prev_vert"]),
            # (the deferred coherent sum runs from the segment ORIGIN —
            # the beam arriving at the aperture — reference
            # plt_path_detail.hpp:72 prev_vert_beam saved pre-transform)
            S_prev=sel(S_int, st["S_prev"]),
            nee_pos=nee_pos, nee_val=nee_val, nee_ok=nee_ok,
        )

    state = jax.lax.fori_loop(0, max_depth, body, state)

    sens = sensor.response.sensitivities(k, tables.spectra, None)

    def to_channels(S4):
        """Stokes (N, ..., 4) → film channels (N, ..., C or C*4);
        polarimetric films interleave I/Q/U/V per channel exactly like
        the backward kernels."""
        s = sens
        while s.ndim < S4.ndim:
            s = s[:, None]
        if polarimetric:
            out = S4[..., None, :] * s[..., None]       # (..., C, 4)
            return out.reshape(S4.shape[:-1] + (-1,))
        return S4[..., 0:1] * s

    values = to_channels(state["acc"])
    nee_val = to_channels(state["nee_val"]).reshape(N * max_depth, -1)
    nee_pos = state["nee_pos"].reshape(N * max_depth, 2)
    nee_ok = state["nee_ok"].reshape(N * max_depth)
    out = (state["pos"], values, state["hit_plane"], state["sig"],
           (nee_pos, nee_val, nee_ok))
    if debug:
        return out + (state,)
    return out
