"""Device BSDF dispatch: batched sample / eval over the material table.

All directions are in the local shading frame (z = shading normal), pointing
away from the surface, matching the reference's bsdf contract
(reference include/wt/bsdf/bsdf.hpp:32, common.hpp:63-90):
* ``eval_f`` returns the Mueller-valued BSDF *including* the |wo.z| cosine.
* ``sample`` returns wo, the sampling density (solid-angle, or the discrete
  probability for specular lobes) and the weighted bsdf Mw = M/pdf.

Dispatch is compute-all-select: every lane evaluates the diffuse, dielectric
and SPM paths and the result is chosen by material type — branch-free and
TPU-friendly for the small closed set of lobe types.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from wave_tracer_tpu.bsdf import profiles
from wave_tracer_tpu.bsdf.table import (MT_DIELECTRIC, MT_DIFFUSE, MT_NULL,
                                        MT_SPM, MaterialTable)
from wave_tracer_tpu.polarization import fresnel as fr
from wave_tracer_tpu.polarization import mueller
from wave_tracer_tpu.sampling import warps
from wave_tracer_tpu.spectrum.bake import ComplexSpectrumTable, SpectrumTable
from wave_tracer_tpu.texture.texture import TextureTable, eval_texture_scalar

INV_PI = 1.0 / math.pi


@struct.dataclass
class Tables:
    """All device lookup tables needed for material evaluation."""
    materials: MaterialTable
    textures: TextureTable
    spectra: SpectrumTable
    cspectra: ComplexSpectrumTable


@struct.dataclass
class BsdfSample:
    wo: jnp.ndarray         # (N, 3) local
    pdf: jnp.ndarray        # (N,)
    Mw: jnp.ndarray         # (N, 4, 4) weighted bsdf M/pdf
    specular: jnp.ndarray   # (N,) bool — discrete (delta) lobe
    eta: jnp.ndarray        # (N,) real oriented η ratio (1 unless refracted)
    refracted: jnp.ndarray  # (N,) bool
    valid: jnp.ndarray      # (N,) bool


def _local_z():
    return jnp.asarray([0.0, 0.0, 1.0], jnp.float32)


def _ior_ratio(tables: Tables, ior_id, ext_ior_id, k):
    """η1/η2 = ext/int at wavenumber k (reference surface_spm.hpp:57-61)."""
    eta2 = jnp.where(ior_id >= 0,
                     tables.cspectra.eval(ior_id, k),
                     jnp.asarray(1.0 + 0.0j, jnp.complex64))
    eta1 = jnp.where(ext_ior_id >= 0,
                     tables.cspectra.eval(ext_ior_id, k),
                     jnp.asarray(1.0 + 0.0j, jnp.complex64))
    return eta1 / eta2


def _spec_or_one(tables: Tables, sid, k):
    return jnp.where(sid >= 0, tables.spectra.eval(sid, k), 1.0)


def _profile_params(tables: Tables, prof_type, prof_gamma,
                    prof_rough_tex, prof_T, prof_sigmah, uv, k):
    rough = eval_texture_scalar(tables.textures, tables.spectra,
                                prof_rough_tex, uv, k)
    has_rough = prof_rough_tex >= 0
    T_direct = jnp.where(has_rough, 1.0, prof_T)
    sigmah = jnp.where(has_rough, 0.0, prof_sigmah)
    # two parameterizations resolved branchlessly: roughness-driven lanes use
    # roughness_to_T, direct lanes use (T, σh)
    T_r = profiles.roughness_to_T(rough)
    a_r = profiles.roughness_to_alpha_param(rough)
    p = profiles.make_params(prof_type, rough, prof_gamma,
                             k, T_direct=T_direct, sigmah=sigmah)
    p.T = jnp.where(has_rough, T_r, p.T)
    p.alpha_param = jnp.where(has_rough, a_r, p.alpha_param)
    # recompute normalization with the chosen T
    km = profiles.k_mm(k)
    x = 1.0 + km * km * p.T
    pf = jnp.power(x, 0.5 * (p.gamma - 1.0))
    nf = 1.0 / jnp.maximum(1.0 - 1.0 / jnp.maximum(pf, 1.0 + 1e-9), 1e-9)
    sg2 = 1.0 / jnp.maximum(p.T, 1e-12)
    ng = 1.0 / jnp.maximum(1.0 - jnp.exp(-0.5 * km * km / sg2), 1e-9)
    p.sigma2_norm = jnp.where(p.ptype == profiles.PROFILE_GAUSSIAN, ng, nf)
    return p


def _flip_wo(wo, eta_r):
    """Map a reflected direction to the refracted side, Snell-scaling the
    transverse components (reference surface_spm.cpp flip_wo)."""
    scale = jnp.where(wo[..., 2] < 0, eta_r, 1.0 / jnp.maximum(eta_r, 1e-9))
    xy = wo[..., :2] * scale[..., None]
    l2 = jnp.sum(xy * xy, axis=-1)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - l2))
    z = jnp.where(wo[..., 2] > 0, -z, z)
    out = jnp.concatenate([xy, z[..., None]], axis=-1)
    bad = l2 > 1.0
    fallback = jnp.zeros_like(out).at[..., 0].set(1.0)
    return jnp.where(bad[..., None], fallback, out), ~bad


def _has_transmission(eta12):
    """Conductors don't transmit (reference surface_spm.cpp:38)."""
    n2 = jnp.real(eta12) ** 2 + jnp.imag(eta12) ** 2
    return jnp.imag(eta12) ** 2 / jnp.maximum(n2, 1e-20) <= 1e-2


def sample(tables: Tables, mat_id, wi, uv, k, u4, duv=None):
    """Sample all lanes' BSDFs. u4 (N, 4) uniforms. Returns BsdfSample."""
    mat = tables.materials
    eff = mat.resolve(mat_id, k)
    eff = jnp.maximum(eff, 0)
    row = mat.pack[eff]          # ONE packed gather for all scalar fields
    i32 = jnp.int32
    mtype = jnp.where(mat_id >= 0, row[:, mat.C_MTYPE].astype(i32),
                      MT_NULL)
    refl_tex = row[:, mat.C_REFL_TEX].astype(i32)
    opacity_tex = row[:, mat.C_OPACITY_TEX].astype(i32)
    ior_id = row[:, mat.C_IOR].astype(i32)
    ext_ior_id = row[:, mat.C_EXT_IOR].astype(i32)
    rscale_id = row[:, mat.C_RSCALE].astype(i32)
    tscale_id = row[:, mat.C_TSCALE].astype(i32)
    prof_type = row[:, mat.C_PROF_TYPE].astype(i32)
    prof_rough_tex = row[:, mat.C_PROF_ROUGH_TEX].astype(i32)

    flip = (row[:, mat.C_TWOSIDED] > 0.5) & (wi[..., 2] < 0.0)
    sgn = jnp.where(flip, -1.0, 1.0)
    wi_l = jnp.concatenate([wi[..., :2], (wi[..., 2] * sgn)[..., None]],
                           axis=-1)
    scale = row[:, mat.C_SCALE]

    # ---- diffuse
    refl = jnp.clip(eval_texture_scalar(tables.textures, tables.spectra,
                                        refl_tex, uv, k, duv), 0.0, 1.0)
    wo_d = warps.cosine_hemisphere(u4[..., 2:4])
    pdf_d = warps.cosine_hemisphere_pdf(wo_d[..., 2])
    Mw_d = mueller.depolarizer(refl * scale)
    valid_d = wi_l[..., 2] > 0.0

    # ---- shared Fresnel
    eta12 = _ior_ratio(tables, ior_id, ext_ior_id, k)
    n = jnp.broadcast_to(_local_z(), wi_l.shape)
    fres = fr.fresnel(eta12, wi_l, n)
    T = 0.5 * (fres["Ts"] + fres["Tp"])
    rs_c, rp_c = fr.fresnel_reflection_conductor(eta12, wi_l, n)
    rscale = _spec_or_one(tables, rscale_id, k) * scale
    tscale = _spec_or_one(tables, tscale_id, k) * scale
    eta_r = jnp.real(fres["eta"])
    J_bwd = eta_r ** 2     # backward-transport radiance compression

    wo_refl = jnp.concatenate([-wi_l[..., :2], wi_l[..., 2:3]], axis=-1)

    # ---- dielectric (src/bsdf/dielectric.cpp:27-73)
    is_refl_die = u4[..., 0] >= T
    pdf_die = jnp.where(is_refl_die, 1.0 - T, T)
    M_refl = mueller.from_jones_sp(fres["rs"], fres["rp"], rscale)
    M_trans = mueller.from_jones_sp(fres["ts"], fres["tp"],
                                    fres["Z"] * tscale * J_bwd)
    Mw_die = jnp.where(is_refl_die[..., None, None], M_refl, M_trans) \
        / jnp.maximum(pdf_die, 1e-9)[..., None, None]
    wo_die = jnp.where(is_refl_die[..., None], wo_refl, fres["t"])
    valid_die = pdf_die > 1e-7

    # ---- surface_spm (src/bsdf/surface_spm.cpp:79-175)
    prof = _profile_params(tables, prof_type,
                           row[:, mat.C_PROF_GAMMA], prof_rough_tex,
                           row[:, mat.C_PROF_T],
                           row[:, mat.C_PROF_SIGMAH], uv, k)
    alpha = profiles.alpha_specular(prof, wi_l[..., 2], wi_l[..., 2], k)
    is_dirac = prof_type == profiles.PROFILE_DIRAC
    alpha = jnp.where(is_dirac, 1.0, alpha)
    has_trans = _has_transmission(eta12)
    is_spec = u4[..., 1] < alpha
    pdf_lobe = jnp.where(is_spec, alpha, 1.0 - alpha)
    is_refl_spm = jnp.where(has_trans, u4[..., 0] >= T,
                            jnp.ones_like(T, bool))
    pdf_spm = pdf_lobe * jnp.where(has_trans,
                                   jnp.where(is_refl_spm, 1.0 - T, T), 1.0)
    Js = jnp.where(is_refl_spm, 1.0, J_bwd)
    sscale = jnp.where(is_refl_spm, rscale, tscale)

    # specular branch
    wo_spm_spec = jnp.where(is_refl_spm[..., None], wo_refl, fres["t"])
    M_spm_spec = jnp.where(is_refl_spm[..., None, None],
                           mueller.from_jones_sp(rs_c, rp_c,
                                                 alpha * sscale),
                           mueller.from_jones_sp(fres["ts"], fres["tp"],
                                                 fres["Z"] * alpha * Js
                                                 * sscale))

    # scatter branch: profile sampling (same hemisphere), then optional flip
    wo_sc, pdf_sc, psd_sc, ok_sc = profiles.sample(prof, wi_l, k, u4[..., 2:4])
    h = wi_l + wo_sc
    hsgn = jnp.where(wi_l[..., 2] < 0, -1.0, 1.0)
    m = hsgn[..., None] * h
    m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-12)
    rs_h, rp_h = fr.fresnel_reflection_conductor(eta12, wi_l, m)
    fres_h = fr.fresnel(eta12, wi_l, m)
    a_s = jnp.where(is_refl_spm, rs_h, fres_h["ts"])
    a_p = jnp.where(is_refl_spm, rp_h, fres_h["tp"])
    Zh = jnp.where(is_refl_spm, 1.0, fres_h["Z"])
    wo_flip, flip_ok = _flip_wo(wo_sc, eta_r)
    wo_spm_sc = jnp.where(is_refl_spm[..., None], wo_sc, wo_flip)
    Msc_scale = (1.0 - alpha) * Js * jnp.abs(wo_spm_sc[..., 2]) * psd_sc \
        * sscale * Zh
    M_spm_sc = mueller.from_jones_sp(a_s, a_p, Msc_scale)
    ok_sc = ok_sc & jnp.where(is_refl_spm, True, flip_ok)

    pdf_spm_out = pdf_spm * jnp.where(is_spec, 1.0, pdf_sc)
    M_spm = jnp.where(is_spec[..., None, None], M_spm_spec, M_spm_sc)
    Mw_spm = M_spm / jnp.maximum(pdf_spm_out, 1e-12)[..., None, None]
    wo_spm = jnp.where(is_spec[..., None], wo_spm_spec, wo_spm_sc)
    valid_spm = (pdf_spm_out > 1e-12) & jnp.where(is_spec, True, ok_sc) \
        & (jnp.abs(wi_l[..., 2]) > 0)

    # ---- opacity mask (reference include/wt/bsdf/mask.hpp): with
    # probability (1−opacity) the surface is passed through (null)
    opacity = jnp.where(
        opacity_tex >= 0,
        jnp.clip(eval_texture_scalar(tables.textures, tables.spectra,
                                     opacity_tex, uv, k),
                 0.0, 1.0), 1.0)
    # decorrelated mask uniform (golden-ratio mix of two draws)
    u_mask = (u4[..., 0] * 0.618034 + u4[..., 3] * 0.381966) % 1.0
    passthrough = u_mask >= opacity

    # ---- null (passthrough)
    wo_null = -wi_l
    Mw_null = mueller.identity(wi_l.shape[:-1])

    # ---- select by type
    def sel(v_d, v_die, v_spm, v_null):
        out = jnp.where((mtype == MT_DIFFUSE)[..., None], v_d,
                        jnp.where((mtype == MT_DIELECTRIC)[..., None],
                                  v_die,
                                  jnp.where((mtype == MT_SPM)[..., None],
                                            v_spm, v_null)))
        return out

    wo = sel(wo_d, wo_die, wo_spm, wo_null)
    Mw = jnp.where((mtype == MT_DIFFUSE)[..., None, None], Mw_d,
                   jnp.where((mtype == MT_DIELECTRIC)[..., None, None],
                             Mw_die,
                             jnp.where((mtype == MT_SPM)[..., None, None],
                                       Mw_spm, Mw_null)))
    pdf = jnp.where(mtype == MT_DIFFUSE, pdf_d,
                    jnp.where(mtype == MT_DIELECTRIC, pdf_die,
                              jnp.where(mtype == MT_SPM, pdf_spm_out, 1.0)))
    specular = jnp.where(mtype == MT_DIFFUSE, False,
                         jnp.where(mtype == MT_DIELECTRIC, True,
                                   jnp.where(mtype == MT_SPM, is_spec,
                                             True)))
    refracted = jnp.where(mtype == MT_DIELECTRIC, ~is_refl_die,
                          jnp.where(mtype == MT_SPM, ~is_refl_spm, False))
    eta_out = jnp.where(refracted, eta_r, 1.0)
    valid = jnp.where(mtype == MT_DIFFUSE, valid_d,
                      jnp.where(mtype == MT_DIELECTRIC, valid_die,
                                jnp.where(mtype == MT_SPM, valid_spm,
                                          mat_id >= 0)))

    # opacity-mask: with prob (1−opacity) pass through (weight 1, delta);
    # otherwise the opacity factor cancels against the branch probability
    # and the inner sample is used unchanged (pdf scaled by opacity)
    has_mask = opacity_tex >= 0
    passthrough = passthrough & has_mask
    wo = jnp.where(passthrough[..., None], wo_null, wo)
    Mw = jnp.where(passthrough[..., None, None], Mw_null, Mw)
    pdf = jnp.where(passthrough, jnp.maximum(1.0 - opacity, 1e-6),
                    jnp.where(has_mask, pdf * opacity, pdf))
    specular = jnp.where(passthrough, True, specular)
    refracted = jnp.where(passthrough, False, refracted)
    valid = valid | passthrough

    # un-flip for twosided back faces
    wo = jnp.concatenate([wo[..., :2], (wo[..., 2] * sgn)[..., None]],
                         axis=-1)
    # DETACHED SAMPLING (SURVEY phase 5 / BASELINE convention): sampled
    # directions and their densities are stop-gradiented — the
    # differentiable radiometric path flows through the weighted value
    # Mw only. This is what makes gradients finite at TIR/grazing
    # boundaries where d(direction)/d(IOR) diverges.
    wo = jax.lax.stop_gradient(wo)
    pdf = jax.lax.stop_gradient(pdf)
    eta_out = jax.lax.stop_gradient(eta_out)
    return BsdfSample(wo=wo, pdf=pdf, Mw=Mw, specular=specular, eta=eta_out,
                      refracted=refracted, valid=valid)


def eval_f(tables: Tables, mat_id, wi, wo, uv, k, duv=None):
    """Evaluate non-delta BSDF lobes: returns (M (N,4,4), pdf (N,)).

    M includes the |wo.z| cosine (reference bsdf_t::f convention); pdf is
    the density `sample` would have for (wi → wo), for MIS.
    """
    mat = tables.materials
    eff = mat.resolve(mat_id, k)
    eff = jnp.maximum(eff, 0)
    row = mat.pack[eff]          # ONE packed gather for all scalar fields
    i32 = jnp.int32
    mtype = jnp.where(mat_id >= 0, row[:, mat.C_MTYPE].astype(i32),
                      MT_NULL)

    flip = (row[:, mat.C_TWOSIDED] > 0.5) & (wi[..., 2] < 0.0)
    sgn = jnp.where(flip, -1.0, 1.0)
    wi_l = jnp.concatenate([wi[..., :2], (wi[..., 2] * sgn)[..., None]],
                           axis=-1)
    wo_l = jnp.concatenate([wo[..., :2], (wo[..., 2] * sgn)[..., None]],
                           axis=-1)
    scale = row[:, mat.C_SCALE]

    # diffuse
    refl = jnp.clip(eval_texture_scalar(
        tables.textures, tables.spectra,
        row[:, mat.C_REFL_TEX].astype(i32), uv, k, duv), 0.0, 1.0)
    both_up = (wi_l[..., 2] > 0) & (wo_l[..., 2] > 0)
    f_d = jnp.where(both_up, wo_l[..., 2] * INV_PI * refl * scale, 0.0)
    M_d = mueller.depolarizer(f_d)
    pdf_d = jnp.where(both_up,
                      warps.cosine_hemisphere_pdf(wo_l[..., 2]), 0.0)

    # surface_spm scatter lobe (surface_spm.cpp:41-77, 174-205)
    eta12 = _ior_ratio(tables, row[:, mat.C_IOR].astype(i32),
                       row[:, mat.C_EXT_IOR].astype(i32), k)
    eta_r_orient = jnp.where(vecz(wi_l) > 0, jnp.real(eta12),
                             1.0 / jnp.maximum(jnp.real(eta12), 1e-9))
    has_trans = _has_transmission(eta12)
    is_refl = wi_l[..., 2] * wo_l[..., 2] >= 0.0
    abs_wo, flip_ok = _flip_wo(wo_l, jnp.real(eta12))
    abs_wo = jnp.where(is_refl[..., None], wo_l, abs_wo)
    prof = _profile_params(tables,
                           row[:, mat.C_PROF_TYPE].astype(i32),
                           row[:, mat.C_PROF_GAMMA],
                           row[:, mat.C_PROF_ROUGH_TEX].astype(i32),
                           row[:, mat.C_PROF_T],
                           row[:, mat.C_PROF_SIGMAH], uv, k)
    alpha_eval = profiles.alpha_specular(prof, wi_l[..., 2],
                                         abs_wo[..., 2], k)
    alpha_s = profiles.alpha_specular(prof, wi_l[..., 2], wi_l[..., 2], k)
    is_dirac = row[:, mat.C_PROF_TYPE].astype(i32) \
        == profiles.PROFILE_DIRAC
    J = jnp.where(is_refl, 1.0, eta_r_orient ** 2)
    rscale = _spec_or_one(tables, row[:, mat.C_RSCALE].astype(i32),
                          k) * scale
    tscale = _spec_or_one(tables, row[:, mat.C_TSCALE].astype(i32),
                          k) * scale
    sscale = jnp.where(is_refl, rscale, tscale)
    h = wi_l + abs_wo
    hsgn = jnp.where(wi_l[..., 2] < 0, -1.0, 1.0)
    m = hsgn[..., None] * h
    m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-12)
    rs_h, rp_h = fr.fresnel_reflection_conductor(eta12, wi_l, m)
    fres_h = fr.fresnel(eta12, wi_l, m)
    a_s = jnp.where(is_refl, rs_h, fres_h["ts"])
    a_p = jnp.where(is_refl, rp_h, fres_h["tp"])
    Zh = jnp.where(is_refl, 1.0, fres_h["Z"])
    psd_abs = profiles.psd_dirs(prof, wi_l, abs_wo, k)
    fmag = (1.0 - alpha_eval) * J * jnp.abs(wo_l[..., 2]) * psd_abs \
        * sscale * Zh
    ok_spm = (~is_dirac) & (jnp.abs(wi_l[..., 2]) > 0) \
        & (jnp.abs(wo_l[..., 2]) > 0) & (is_refl | has_trans) \
        & (is_refl | flip_ok)
    M_spm = mueller.from_jones_sp(a_s, a_p, jnp.where(ok_spm, fmag, 0.0))
    # pdf: lobe prob (1-αs) × T/R prob × profile pdf (surface_spm.cpp pdf())
    n = jnp.broadcast_to(_local_z(), wi_l.shape)
    fres = fr.fresnel(eta12, wi_l, n)
    T = 0.5 * (fres["Ts"] + fres["Tp"])
    prob_tr = jnp.where(has_trans,
                        jnp.where(is_refl, 1.0 - T, T), 1.0)
    pdf_spm = jnp.where(ok_spm,
                        (1.0 - alpha_s) * prob_tr
                        * profiles.pdf(prof, wi_l, abs_wo, k), 0.0)

    zero_M = jnp.zeros_like(M_d)
    M = jnp.where((mtype == MT_DIFFUSE)[..., None, None], M_d,
                  jnp.where((mtype == MT_SPM)[..., None, None], M_spm,
                            zero_M))
    pdf = jnp.where(mtype == MT_DIFFUSE, pdf_d,
                    jnp.where(mtype == MT_SPM, pdf_spm, 0.0))

    # opacity mask scales the scatter lobes (mask.hpp: f = opacity·f_in)
    opacity_tex = row[:, mat.C_OPACITY_TEX].astype(i32)
    opacity = jnp.where(
        opacity_tex >= 0,
        jnp.clip(eval_texture_scalar(tables.textures, tables.spectra,
                                     opacity_tex, uv, k),
                 0.0, 1.0), 1.0)
    M = M * opacity[..., None, None]
    pdf = pdf * opacity
    return M, pdf


def vecz(v):
    return v[..., 2]


def apply_normalmap(tables: Tables, mat_id, uv, k, sf, duv=None):
    """Perturb a shading frame by the material's normal map (reference
    include/wt/bsdf/normalmap.hpp). Returns the (possibly) new frame."""
    from wave_tracer_tpu.math import frame as frame_mod
    from wave_tracer_tpu.texture.texture import eval_texture_rgb
    mat = tables.materials
    eff = jnp.maximum(mat.resolve(mat_id, k), 0)
    tex = mat.pack[eff, mat.C_NORMALMAP_TEX].astype(jnp.int32)
    rgb = eval_texture_rgb(tables.textures, tables.spectra, tex, uv,
                           duv)
    n_local = 2.0 * rgb - 1.0
    n_local = n_local / jnp.maximum(
        jnp.linalg.norm(n_local, axis=-1, keepdims=True), 1e-6)
    n_world = sf.to_world(n_local)
    perturbed = frame_mod.build_shading_frame(n_world, sf.t)
    use = (tex >= 0)[..., None]
    return frame_mod.Frame(
        t=jnp.where(use, perturbed.t, sf.t),
        b=jnp.where(use, perturbed.b, sf.b),
        n=jnp.where(use, perturbed.n, sf.n))
