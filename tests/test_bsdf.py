"""BSDF layer tests: table bake, dispatch, energy conservation."""

import numpy as np
import jax.numpy as jnp

from wave_tracer_tpu.bsdf import (CompositeBSDF, DielectricBSDF, DiffuseBSDF,
                                  Material, SpmBSDF, SurfaceProfile,
                                  bake_materials)
from wave_tracer_tpu.bsdf import device as bsdf_dev
from wave_tracer_tpu.bsdf import profiles
from wave_tracer_tpu.spectrum import bake as sbake
from wave_tracer_tpu.spectrum.spectra import (ComplexUniformSpectrum,
                                              UniformSpectrum)
from wave_tracer_tpu.texture.texture import (ConstantSpectrumTexture,
                                             bake_textures)

K_GREEN = 2 * np.pi / 550e-9


def make_tables():
    refl_spec = UniformSpectrum(0.7, 1.0, 1e8)
    rough_spec = UniformSpectrum(0.1, 1.0, 1e8)
    glass = ComplexUniformSpectrum(1.0 / 1.5)   # eta ratio via ext/int
    glass_ior = ComplexUniformSpectrum(1.5)
    gold = ComplexUniformSpectrum(0.2 + 3.0j)
    refl_tex = ConstantSpectrumTexture(refl_spec)
    rough_tex = ConstantSpectrumTexture(rough_spec)

    specs = [refl_spec, rough_spec]
    spec_ids = {id(s): i for i, s in enumerate(specs)}
    cspecs = [glass_ior, gold]
    cspec_ids = {id(s): i for i, s in enumerate(cspecs)}
    texs = [refl_tex, rough_tex]
    tex_ids = {id(t): i for i, t in enumerate(texs)}

    mats = [
        Material(bsdf=DiffuseBSDF(reflectance=refl_tex), name="diffuse"),
        Material(bsdf=DielectricBSDF(ior=glass_ior), name="glass"),
        Material(bsdf=SpmBSDF(ior=gold,
                              profile=SurfaceProfile(
                                  type="fractal", gamma=3.0,
                                  roughness=rough_tex)), name="gold"),
        Material(bsdf=SpmBSDF(ior=glass_ior,
                              profile=SurfaceProfile(type="dirac")),
                 name="smooth_spm"),
    ]
    mt = bake_materials(mats, tex_ids, spec_ids, cspec_ids)
    tt = bake_textures(texs, spec_ids)
    st = sbake.bake_spectra(specs)
    ct = sbake.bake_complex(cspecs)
    return bsdf_dev.Tables(materials=mt, textures=tt, spectra=st,
                           cspectra=ct)


TABLES = make_tables()


def _sample(mat_id, wi, u4, k=K_GREEN, n=None):
    N = len(u4)
    return bsdf_dev.sample(
        TABLES, jnp.full((N,), mat_id, jnp.int32),
        jnp.broadcast_to(jnp.asarray(wi, jnp.float32), (N, 3)),
        jnp.zeros((N, 2)), jnp.full((N,), k, jnp.float32),
        jnp.asarray(u4, jnp.float32))


class TestDiffuse:
    def test_weight_equals_reflectance(self):
        rng = np.random.default_rng(0)
        s = _sample(0, [0.3, 0.1, 0.95], rng.random((64, 4)))
        assert bool(jnp.all(s.valid))
        # weighted bsdf intensity term == reflectance (0.7)
        np.testing.assert_allclose(np.asarray(s.Mw[:, 0, 0]), 0.7,
                                   atol=1e-5)
        assert bool(jnp.all(s.wo[:, 2] > 0))
        assert not bool(jnp.any(s.specular))

    def test_eval_matches_pdf_ratio(self):
        N = 16
        rng = np.random.default_rng(1)
        wi = jnp.asarray([0.0, 0.0, 1.0])
        s = _sample(0, wi, rng.random((N, 4)))
        M, pdf = bsdf_dev.eval_f(
            TABLES, jnp.zeros((N,), jnp.int32),
            jnp.broadcast_to(wi, (N, 3)), s.wo, jnp.zeros((N, 2)),
            jnp.full((N,), K_GREEN, jnp.float32))
        np.testing.assert_allclose(np.asarray(pdf), np.asarray(s.pdf),
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(M[:, 0, 0] / pdf),
                                   np.asarray(s.Mw[:, 0, 0]), rtol=1e-4)


class TestDielectric:
    def test_energy_split(self):
        # unpolarized energy: E[weight] over reflect+refract = 1 per lane
        rng = np.random.default_rng(2)
        u4 = rng.random((4096, 4))
        s = _sample(1, [0.3, 0.0, 0.954], u4)
        w = np.asarray(s.Mw[:, 0, 0])
        refr = np.asarray(s.refracted)
        # refraction weight includes radiance compression eta^2;
        # undo it for the energy audit
        w_energy = np.where(refr, w / np.asarray(s.eta) ** 2, w)
        assert abs(w_energy.mean() - 1.0) < 0.05
        assert bool(jnp.all(s.specular))

    def test_tir(self):
        # inside glass beyond critical angle -> all reflect
        th = np.deg2rad(60.0)
        wi = [np.sin(th), 0.0, -np.cos(th)]
        rng = np.random.default_rng(3)
        s = _sample(1, wi, rng.random((128, 4)))
        assert not bool(jnp.any(s.refracted))
        np.testing.assert_allclose(np.asarray(s.Mw[:, 0, 0]), 1.0,
                                   atol=1e-4)

    def test_snell(self):
        wi = [np.sin(0.5), 0.0, np.cos(0.5)]
        rng = np.random.default_rng(4)
        s = _sample(1, wi, rng.random((256, 4)))
        refr = np.asarray(s.refracted)
        assert refr.any()
        wo = np.asarray(s.wo)[refr]
        sin_t = np.abs(wo[:, 0])
        np.testing.assert_allclose(sin_t, np.sin(0.5) / 1.5, atol=1e-5)
        assert (wo[:, 2] < 0).all()


class TestSpm:
    def test_gold_reflectivity_bound(self):
        rng = np.random.default_rng(5)
        s = _sample(2, [0.2, 0.0, 0.98], rng.random((2048, 4)))
        w = np.asarray(s.Mw[:, 0, 0])
        valid = np.asarray(s.valid)
        # energy must not exceed conductor reflectivity ~0.93-0.97 by much
        assert w[valid].mean() < 1.1
        assert (w[valid] >= 0).all()

    def test_dirac_profile_always_specular(self):
        rng = np.random.default_rng(6)
        s = _sample(3, [0.2, 0.0, 0.98], rng.random((128, 4)))
        assert bool(jnp.all(s.specular))

    def test_rough_scatter_lobe_near_mirror(self):
        # low roughness: scattered lobe concentrates near mirror direction
        rng = np.random.default_rng(7)
        wi = [0.5, 0.0, np.sqrt(1 - 0.25)]
        s = _sample(2, wi, rng.random((4096, 4)))
        sc = np.asarray(~s.specular & s.valid)
        assert sc.sum() > 50
        wo = np.asarray(s.wo)[sc]
        mirror = np.array([-0.5, 0.0, np.sqrt(1 - 0.25)])
        cos_to_mirror = wo @ mirror
        assert np.median(cos_to_mirror) > 0.9

    def test_eval_pdf_consistency(self):
        N = 512
        rng = np.random.default_rng(8)
        wi = jnp.asarray([0.3, 0.2, np.sqrt(1 - 0.13)], jnp.float32)
        s = _sample(2, np.asarray(wi), rng.random((N, 4)))
        sc = np.asarray(~s.specular & s.valid)
        M, pdf = bsdf_dev.eval_f(
            TABLES, jnp.full((N,), 2, jnp.int32),
            jnp.broadcast_to(wi, (N, 3)), s.wo, jnp.zeros((N, 2)),
            jnp.full((N,), K_GREEN, jnp.float32))
        ratio = np.asarray(M[:, 0, 0]) / np.maximum(np.asarray(pdf), 1e-12)
        np.testing.assert_allclose(ratio[sc], np.asarray(s.Mw[:, 0, 0])[sc],
                                   rtol=2e-2, atol=1e-3)


class TestProfiles:
    def test_alpha_dirac(self):
        p = profiles.make_params(jnp.asarray(profiles.PROFILE_DIRAC),
                                 0.0, 3.0, K_GREEN, T_direct=jnp.asarray(1.0),
                                 sigmah=jnp.asarray(0.0))
        a = profiles.alpha_specular(p, jnp.asarray(1.0), jnp.asarray(1.0),
                                    K_GREEN)
        assert float(a) == 1.0

    def test_alpha_decreases_with_roughness(self):
        vals = []
        for r in [1e-5, 3e-4, 1e-3]:
            T = profiles.roughness_to_T(jnp.asarray(r))
            p = profiles.make_params(
                jnp.asarray(profiles.PROFILE_FRACTAL), r, 3.0, K_GREEN,
                T_direct=T,
                sigmah=jnp.sqrt(profiles.roughness_to_alpha_param(
                    jnp.asarray(r))))
            vals.append(float(profiles.alpha_specular(
                p, jnp.asarray(1.0), jnp.asarray(1.0), K_GREEN)))
        assert vals[0] > vals[1] > vals[2]
        assert 0.0 <= vals[2] < 0.01 and vals[0] > 0.99

    def test_psd_sampling_consistency(self):
        # pdf() must match the pdf returned by sample()
        rng = np.random.default_rng(9)
        N = 256
        T = profiles.roughness_to_T(jnp.asarray(0.2))
        p = profiles.make_params(
            jnp.full((N,), profiles.PROFILE_FRACTAL), 0.2, 3.0,
            jnp.full((N,), K_GREEN, jnp.float32),
            T_direct=jnp.full((N,), float(T)),
            sigmah=jnp.full((N,), 0.02))
        wi = jnp.broadcast_to(
            jnp.asarray([0.4, 0.0, np.sqrt(1 - 0.16)], jnp.float32), (N, 3))
        wo, pdf_s, psd_s, ok = profiles.sample(
            p, wi, jnp.full((N,), K_GREEN, jnp.float32),
            jnp.asarray(rng.random((N, 2)), jnp.float32))
        pdf_e = profiles.pdf(p, wi, wo,
                             jnp.full((N,), K_GREEN, jnp.float32))
        okm = np.asarray(ok)
        np.testing.assert_allclose(np.asarray(pdf_e)[okm],
                                   np.asarray(pdf_s)[okm], rtol=1e-3)
