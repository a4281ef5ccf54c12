"""Pixel-gradient parity through the WAVE transport paths.

BASELINE.json's north star: per-pixel gradient maps (not scalar means)
w.r.t. scene parameters, validated against central finite differences,
through the wave kernel (trace_paths_wave) and the forward/diffraction
kernel (trace_forward on a slit scene). The counter-based RNG makes
f(θ) deterministic in θ, so FD and AD see identical discrete decisions
(no RR inside these depths; lobe/emitter picks are θ-invariant).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("WT_SLOW_TESTS"),
    reason="slow (AD through the wave integrator); set WT_SLOW_TESTS=1")

from tests.test_render import make_box_scene
from wave_tracer_tpu.integrator.plt_path import trace_paths_wave
from wave_tracer_tpu.sampling import rng
from wave_tracer_tpu.scene import build_scene

RES = 8


@pytest.fixture(scope="module")
def wave_setup():
    scene = make_box_scene(res=RES, spp=1)
    built = build_scene(scene)
    sensor = scene.sensors[0]
    N = RES * RES
    pix = jnp.arange(N, dtype=jnp.int32)
    pxy = jnp.stack([pix % RES, pix // RES], axis=-1)
    jitter = jnp.full((N, 2), 0.5)
    sids = jnp.zeros((N,), jnp.int32)
    key = rng.make_base_key(3)

    def pixel_image(data):
        pos, values, ok = trace_paths_wave(
            data, pxy, jitter, key, sids, sensor=sensor,
            edge_table=data.edges, max_depth=3, eps=1e-4)
        return values.reshape(RES, RES, -1)

    return built, pixel_image


def _scaled(built, row_scale):
    st = built.data.tables.spectra
    vals = st.vals * row_scale[:, None]
    return built.data.replace(
        tables=built.data.tables.replace(spectra=st.replace(vals=vals)))


def _grad_map_and_fd(built, pixel_image, row_mask, h=0.05):
    def f(theta):
        S = built.data.tables.spectra.vals.shape[0]
        rs = jnp.ones((S,)) + row_mask * (theta - 1.0)
        return pixel_image(_scaled(built, rs))

    g = jax.jacfwd(f)(1.0)
    fd = (f(1.0 + h) - f(1.0 - h)) / (2 * h)
    return np.asarray(g), np.asarray(fd), np.asarray(f(1.0))


class TestWavePixelGradients:
    def test_all_reflectance_pixel_grads_vs_fd(self, wave_setup):
        built, pixel_image = wave_setup
        S = built.data.tables.spectra.vals.shape[0]
        g, fd, img = _grad_map_and_fd(built, pixel_image, jnp.ones((S,)))
        assert np.isfinite(g).all(), "NaN/inf in wave pixel gradients"
        assert (g != 0).any()
        # per-pixel allclose (FD of a smooth deterministic f)
        scale = np.abs(fd).max()
        np.testing.assert_allclose(g, fd, rtol=0.12, atol=0.02 * scale)

    def test_emitter_scale_pixel_grads_vs_fd(self, wave_setup):
        built, pixel_image = wave_setup
        S = built.data.tables.spectra.vals.shape[0]
        et = built.data.emitters
        # scale only the emitters' spectra rows
        rows = np.zeros(S, np.float32)
        for sid in np.unique(np.asarray(et.spec_id)):
            if sid >= 0:
                rows[int(sid)] = 1.0
        assert rows.any()
        g, fd, img = _grad_map_and_fd(built, pixel_image,
                                      jnp.asarray(rows))
        assert np.isfinite(g).all()
        # emission scales the image linearly: g must be positive wherever
        # the image is lit
        lit = img.sum(-1) > 1e-3 * img.max()
        assert (g.sum(-1)[lit] > 0).all()
        scale = np.abs(fd).max()
        np.testing.assert_allclose(g, fd, rtol=0.12, atol=0.02 * scale)


class TestForwardFringeGradients:
    def test_fringe_image_grads_vs_fd(self):
        """Pixel gradients of the double-slit fringe pattern w.r.t. the
        emitter power, through the forward kernel + FSD machinery and the
        Gaussian direct splat."""
        from wave_tracer_tpu.integrator.plt_path_forward import (
            trace_forward)
        from wave_tracer_tpu.scene.xml import load_scene_xml
        from wave_tracer_tpu.sensor import film as film_mod

        scene = load_scene_xml(
            "/root/reference/scenes/diffraction_simple/double_slits.xml",
            {"pattern": "true", "res": "64", "spp": "2"})
        built = build_scene(scene)
        sensor = scene.sensors[0]
        N = 512
        lane_ids = jnp.arange(N, dtype=jnp.int32)
        sids = jnp.zeros((N,), jnp.int32)
        key = rng.make_base_key(5)

        # Scale ONLY the emitter spectrum rows (the parameter under test).
        # Scaling material rows (the screen's IOR, the fractal profile's
        # roughness) would move the DISCRETE lobe-selection thresholds
        # (u < alpha(θ), u >= T(θ) in bsdf/device.py::sample) under the FD
        # perturbation: FD then sees decision flips AD never takes, which
        # is exactly the detached-sampling convention's blind spot.
        # Uniformly scaling every emitter row keeps all discrete decisions
        # (emitter pmf, spectral draw, lobe picks, RR ratios) θ-invariant,
        # so f(θ) is smooth and FD is a valid oracle for AD.
        S = built.data.tables.spectra.vals.shape[0]
        et = built.data.emitters
        rows = np.zeros(S, np.float32)
        for sid in np.unique(np.asarray(et.spec_id)):
            if sid >= 0:
                rows[int(sid)] = 1.0
        assert rows.any()
        row_mask = jnp.asarray(rows)

        def f(theta):
            data = _scaled(built,
                           jnp.ones((S,)) + row_mask * (theta - 1.0))
            pos, values, ok, sig, nee = trace_forward(
                data, lane_ids, key, sids, sensor=sensor,
                edge_table=data.edges, max_depth=4, eps=1e-5)
            film = film_mod.make_film(sensor.width, sensor.height,
                                      values.shape[-1],
                                      sensor.rfilter_sigma)
            film = film_mod.splat_direct_gaussian(film, pos, sig,
                                                  values, ok)
            nee_pos, nee_val, nee_ok = nee
            film = film_mod.splat_direct(film, nee_pos, nee_val, nee_ok)
            return film_mod.develop(film, 1.0)

        # FD is evaluated through the SAME jvp-lowered executable that
        # produces the AD tangent. The estimator's discrete geometric
        # skeleton (edge-set membership d<=r(z), z-ordered top-K picks on
        # the head-on slit screen, FSD lobe picks) is θ-invariant but NOT
        # lowering-invariant: XLA fuses the plain and jvp graphs
        # differently, and 1-ulp rounding shifts flip near-tie
        # classifications at ~3% of lanes, changing nee_val by O(1)
        # (verified: AD tangent == jvp-primal linear coefficient exactly;
        # the plain-lowered primal is the thing that differs). Comparing
        # against the same lowering makes FD a valid oracle for the
        # differentiation rules themselves.
        jvp1 = jax.jit(lambda t: jax.jvp(f, (t,), (1.0,)))
        f1, g = jvp1(1.0)
        h = 0.05
        fp, _ = jvp1(1.0 + h)
        fm, _ = jvp1(1.0 - h)
        fd = (np.asarray(fp) - np.asarray(fm)) / (2 * h)
        g = np.asarray(g)
        assert np.isfinite(g).all(), "NaN/inf in fringe pixel gradients"
        assert (g != 0).any()
        scale = max(np.abs(fd).max(), 1e-30)
        np.testing.assert_allclose(g, fd, rtol=0.12, atol=0.02 * scale)
        # cross-lowering sanity: the plain-lowered image agrees with the
        # jvp-lowered one except at rounding-chaotic FSD-NEE pixels
        f_plain = np.asarray(f(1.0))
        frac_off = (~np.isclose(f_plain, np.asarray(f1), rtol=0.12,
                                atol=0.02 * scale)).mean()
        assert frac_off < 0.06, \
            f"{frac_off:.1%} of pixels unstable across lowerings"
