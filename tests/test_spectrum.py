"""Spectrum layer tests: distributions, CIE machinery, spectrum types,
IOR data loaders, polarization algebra."""

import numpy as np
import jax.numpy as jnp
import pytest

from wave_tracer_tpu.math import dist, vec
from wave_tracer_tpu.polarization import fresnel, mueller, stokes
from wave_tracer_tpu.spectrum import cie, ior, spectra


class TestDistributions:
    def test_piecewise_linear_sampling_matches_pdf(self):
        x = np.array([0.0, 1.0, 2.0, 4.0])
        f = np.array([0.0, 2.0, 1.0, 0.0])
        d = dist.build_piecewise_linear(x, f)
        # total = .5*2*1 + .5*3*1 + ... trapezoids: 1 + 1.5 + 1 = 3.5
        np.testing.assert_allclose(float(d.total), 3.5, rtol=1e-6)
        u = jnp.linspace(0.001, 0.999, 4001)
        xs, pdf = d.sample(u)
        # histogram of samples should match pdf
        hist, edges = np.histogram(np.asarray(xs), bins=32, range=(0, 4),
                                   density=True)
        centers = 0.5 * (edges[1:] + edges[:-1])
        ref = np.asarray(d.pdf(jnp.asarray(centers)))
        np.testing.assert_allclose(hist, ref, atol=0.06)
        # pdf returned by sample == pdf evaluated at sample
        np.testing.assert_allclose(np.asarray(pdf),
                                   np.asarray(d.pdf(xs)), atol=1e-4)

    def test_piecewise_linear_integral(self):
        x = np.linspace(0, np.pi, 200)
        d = dist.build_piecewise_linear(x, np.sin(x))
        np.testing.assert_allclose(float(d.integral(0.0, np.pi)), 2.0,
                                   rtol=1e-3)
        np.testing.assert_allclose(float(d.integral(0.5, 1.0)),
                                   np.cos(0.5) - np.cos(1.0), rtol=1e-3)

    def test_discrete(self):
        d = dist.build_discrete([1.0, 2.0, 3.0], [1.0, 2.0, 1.0])
        i, pos, pmf = d.sample(jnp.asarray(0.5))
        assert int(i) == 1 and float(pos) == 2.0
        np.testing.assert_allclose(float(pmf), 0.5)
        np.testing.assert_allclose(float(d.pmf(jnp.asarray(0))), 0.25)


class TestCIE:
    def test_cmf_peaks(self):
        # y-bar peaks near 555nm with value ~1
        lam = np.linspace(400, 700, 601)
        _, y, _ = cie.xyz_cmf(lam)
        assert abs(lam[np.argmax(y)] - 555) < 15
        assert abs(y.max() - 1.0) < 0.05

    def test_rgb_matrix_whitepoint(self):
        M = cie.xyz_to_rgb_matrix("sRGB", "D65")
        W = np.array([0.31272 / 0.32903, 1.0,
                      (1 - 0.31272 - 0.32903) / 0.32903])
        np.testing.assert_allclose(M @ W, [1, 1, 1], atol=1e-6)

    def test_planck_wien_peak(self):
        # B_k peaks at k ≈ 1.5936·kB·T/(ħc) (Wien for cubic-power law)
        k = np.geomspace(1e5, 1e8, 40000)
        B = cie.planck_spectral_radiance_wavenumber(k, 6000.0)
        kpk = k[np.argmax(B)]
        expect = 2.8214393721 * cie.KBOLTZ * 6000.0 / (cie.HBAR * cie.C_LIGHT)
        np.testing.assert_allclose(kpk, expect, rtol=1e-2)

    def test_planckian_locus_d65ish(self):
        xyz = cie.planckian_locus_xyz(6504.0)
        xy = xyz[:2] / xyz.sum()
        # planckian locus at 6504K is near (but below) D65
        assert abs(xy[0] - 0.3135) < 0.01 and abs(xy[1] - 0.3237) < 0.012


class TestSpectra:
    def test_uniform_power(self):
        s = spectra.UniformSpectrum(2.0, 1.0, 3.0)
        assert s.power() == 4.0
        np.testing.assert_allclose(s.eval(np.array([0.5, 2.0, 3.5])),
                                   [0, 2, 0])

    def test_gaussian_power(self):
        s = spectra.GaussianSpectrum(k0=1e7, sigma_k=1e5, val0=3.0)
        np.testing.assert_allclose(
            s.power(), 3.0 * 1e5 * np.sqrt(2 * np.pi), rtol=1e-6)

    def test_discrete(self):
        s = spectra.DiscreteSpectrum(np.array([1e6]), np.array([2.5]))
        assert s.is_discrete and s.power() == 2.5
        assert s.mean_wavenumber() == 1e6

    def test_rgb_uplift_white_flat(self):
        s = spectra.RGBSpectrum((1.0, 1.0, 1.0))
        lam = np.linspace(400e-9, 700e-9, 20)
        v = s.eval(2 * np.pi / lam)
        np.testing.assert_allclose(v, 1.0, atol=0.01)

    def test_rgb_uplift_red_resembles_red(self):
        s = spectra.RGBSpectrum((1.0, 0.0, 0.0))
        red = s.eval(2 * np.pi / 650e-9)
        blue = s.eval(2 * np.pi / 450e-9)
        assert red > 0.8 and blue < 0.15

    def test_blackbody_eval_positive(self):
        s = spectra.BlackbodySpectrum(T=7000.0, scale=1.0)
        assert s.power() > 0
        assert s.eval(np.array([1.2e7]))[0] > 0

    def test_composite_switches_by_band(self):
        vis = spectra.UniformSpectrum(1.0, 1e6, 1e8)
        radio = spectra.UniformSpectrum(5.0, 1.0, 1e3)
        s = spectra.CompositeSpectrum(bins=[(1.0, 1e3, radio),
                                            (1e6, 1e8, vis)])
        np.testing.assert_allclose(s.eval(np.array([10.0, 1e7])), [5, 1])

    def test_analytic(self):
        s = spectra.AnalyticSpectrum("2*k/k", kmin=1.0, kmax=10.0)
        np.testing.assert_allclose(s.eval(np.array([5.0])), [2.0])


class TestIOR:
    def test_itu_metal_high_kappa(self):
        m = ior.ITUComplexSpectrum("metal")
        k = 2 * np.pi * 10e9 / ior.C_LIGHT   # 10 GHz
        eta = m.eval(np.array([k]))[0]
        assert abs(eta.imag) > 50  # metals: huge extinction at radio
        # sqrt(eps - i sigma/(eps0 w)) has |Re| == |Im| for sigma-dominated
        np.testing.assert_allclose(abs(eta.real), abs(eta.imag), rtol=0.01)

    def test_itu_concrete(self):
        m = ior.ITUComplexSpectrum("concrete")
        k = 2 * np.pi * 10e9 / ior.C_LIGHT
        eta = m.eval(np.array([k]))[0]
        # n ≈ sqrt(5.24) ≈ 2.29
        assert 2.0 < eta.real < 2.6

    @pytest.mark.skipif(ior.resolve_data("ior/Au.yml") is None,
                        reason="reference data not available")
    def test_gold_tabulated(self):
        au = ior.load_material_ior("Au")
        eta = au.eval(np.array([2 * np.pi / 633e-9]))[0]  # HeNe red
        # literature: Au at 633nm ≈ 0.18 + 3.0i
        assert eta.real < 0.6 and 2.0 < eta.imag < 4.0

    @pytest.mark.skipif(ior.resolve_data("ior/BK7.yml") is None,
                        reason="reference data not available")
    def test_bk7_sellmeier(self):
        bk7 = ior.load_material_ior("BK7")
        eta = bk7.eval(np.array([2 * np.pi / 587.6e-9]))[0]
        np.testing.assert_allclose(eta.real, 1.5168, atol=2e-3)

    @pytest.mark.skipif(
        ior.resolve_data("emission/2534_CFL_Tensor_Twister.yml") is None,
        reason="reference data not available")
    def test_emission_loads(self):
        s = ior.load_emission_spectrum("2534_CFL_Tensor_Twister")
        assert s.power() > 0


class TestPolarization:
    def test_fresnel_normal_incidence(self):
        w = jnp.asarray([[0.0, 0.0, 1.0]])
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        fr = fresnel.fresnel(jnp.asarray([1.0 / 1.5], jnp.complex64), w, n)
        # R = ((n1-n2)/(n1+n2))^2 = (0.5/2.5)^2 = 0.04
        np.testing.assert_allclose(np.abs(np.asarray(fr["rs"])) ** 2,
                                   [0.04], atol=1e-5)
        np.testing.assert_allclose(np.asarray(fr["Ts"]), [0.96], atol=1e-5)
        np.testing.assert_allclose(np.asarray(fr["t"]),
                                   [[0, 0, -1]], atol=1e-6)

    def test_fresnel_brewster(self):
        # at Brewster's angle rp = 0 (n2=1.5): θB = atan(1.5) ≈ 56.31°
        th = np.arctan(1.5)
        w = jnp.asarray([[np.sin(th), 0.0, np.cos(th)]])
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        fr = fresnel.fresnel(jnp.asarray([1 / 1.5], jnp.complex64), w, n)
        assert abs(np.asarray(fr["rp"])[0]) < 1e-5

    def test_fresnel_tir(self):
        # from glass to air beyond critical angle
        th = np.deg2rad(60.0)
        w = jnp.asarray([[np.sin(th), 0.0, np.cos(th)]])
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        fr = fresnel.fresnel(jnp.asarray([1.5], jnp.complex64), w, n)
        assert bool(fr["tir"][0])
        np.testing.assert_allclose(np.asarray(fr["Ts"]), [0.0])

    def test_energy_conservation_dielectric(self):
        th = np.deg2rad(35.0)
        w = jnp.asarray([[np.sin(th), 0.0, np.cos(th)]])
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        fr = fresnel.fresnel(jnp.asarray([1 / 1.5], jnp.complex64), w, n)
        Rs = np.abs(np.asarray(fr["rs"])[0]) ** 2
        Rp = np.abs(np.asarray(fr["rp"])[0]) ** 2
        np.testing.assert_allclose(Rs + np.asarray(fr["Ts"])[0], 1, atol=1e-5)
        np.testing.assert_allclose(Rp + np.asarray(fr["Tp"])[0], 1, atol=1e-5)

    def test_conductor_reflectivity(self):
        # gold-ish at normal incidence: R = |(1-eta)/(1+eta)|^2, eta=0.2+3i
        eta = 0.2 + 3.0j
        w = jnp.asarray([[0.0, 0.0, 1.0]])
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        rs, rp = fresnel.fresnel_reflection_conductor(
            jnp.asarray([1.0 / eta], jnp.complex64), w, n)
        R_expect = abs((1 - eta) / (1 + eta)) ** 2
        np.testing.assert_allclose(np.abs(np.asarray(rs)[0]) ** 2, R_expect,
                                   rtol=1e-4)
        np.testing.assert_allclose(np.abs(np.asarray(rp)[0]) ** 2, R_expect,
                                   rtol=1e-4)

    def test_mueller_rotation_roundtrip(self):
        S = jnp.asarray([2.0, 0.5, 0.3, 0.1])
        th = jnp.asarray(0.7)
        S2 = stokes.rotate(stokes.rotate(S, th), -th)
        np.testing.assert_allclose(np.asarray(S2), np.asarray(S), atol=1e-6)
        # matrix path agrees with direct path
        M = mueller.rotation(th)
        np.testing.assert_allclose(np.asarray(mueller.apply(M, S)),
                                   np.asarray(stokes.rotate(S, th)),
                                   atol=1e-6)

    def test_jones_to_mueller_polarizer_limit(self):
        # a_s=1, a_p=0 is an S-polarizer: I -> I/2, Q -> I/2
        M = mueller.from_jones_sp(jnp.asarray(1.0 + 0j),
                                  jnp.asarray(0.0 + 0j))
        S = mueller.apply(M, stokes.unpolarized(jnp.asarray(1.0)))
        np.testing.assert_allclose(np.asarray(S), [0.5, 0.5, 0, 0],
                                   atol=1e-6)

    def test_mueller_fresnel_intensity(self):
        # unpolarized reflection: I_out = (|rs|^2+|rp|^2)/2
        rs = jnp.asarray(0.3 + 0.1j)
        rp = jnp.asarray(0.2 - 0.4j)
        M = mueller.from_jones_sp(rs, rp)
        S = mueller.apply(M, stokes.unpolarized(jnp.asarray(1.0)))
        expect = 0.5 * (abs(0.3 + 0.1j) ** 2 + abs(0.2 - 0.4j) ** 2)
        np.testing.assert_allclose(float(S[0]), expect, rtol=1e-5)

    def test_reorient(self):
        d = jnp.asarray([0.0, 0.0, 1.0])
        x1 = jnp.asarray([1.0, 0.0, 0.0])
        x2 = jnp.asarray([0.0, 1.0, 0.0])   # rotated +90°
        S = jnp.asarray([1.0, 1.0, 0.0, 0.0])  # fully +x polarized
        S2 = stokes.reorient(S, x1, x2, d)
        # in the rotated frame, polarization is along -x' → Q = -1
        np.testing.assert_allclose(np.asarray(S2), [1, -1, 0, 0], atol=1e-6)
