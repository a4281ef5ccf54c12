"""Gradient breadth: geometry, surface-profile roughness, and BDPT.

BASELINE's north star: differentiable w.r.t. "BSDF, emitter and geometry
parameters". The spectra-scale (emitter/reflectance) classes live in
test_gradients.py / test_gradients_wave.py; here:

* geometry — a wall translated along its normal, differentiated through
  the intersection distance (trace is exact-AD through ray_tri; sampled
  directions stay detached),
* roughness — the SPM surface-profile roughness row, through the wave
  kernel's NEE evaluation (profile chosen rough enough that the
  specular-lobe pick alpha stays ~0, keeping discrete decisions
  θ-invariant so FD is a valid oracle),
* BDPT — emitter-power scaling through the full bidirectional
  estimator (linear in θ: every MIS ratio and connection weight is
  radiance-free).
"""

import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("WT_SLOW_TESTS"),
    reason="slow (AD through full integrators); set WT_SLOW_TESTS=1")

from tests.test_render import make_box_scene
from wave_tracer_tpu.integrator.path import trace_paths
from wave_tracer_tpu.integrator.plt_bdpt import trace_bdpt
from wave_tracer_tpu.integrator.plt_path import trace_paths_wave
from wave_tracer_tpu.sampling import rng
from wave_tracer_tpu.scene import build_scene

RES = 8


def _lanes(res):
    N = res * res
    pix = jnp.arange(N, dtype=jnp.int32)
    pxy = jnp.stack([pix % res, pix // res], axis=-1)
    return pxy, jnp.full((N, 2), 0.5), jnp.zeros((N,), jnp.int32)


def translate_shape(data, shape_id: int, delta):
    """Device-side rigid translation of one shape: moves p0 (and the
    packed tri_geom row) so AD flows through the intersection solve.
    Normals/edges/BVH are translation-stale but unused for a small
    translation of a planar wall (classical kernel, brute trace)."""
    mask = (data.geo.shape_id == shape_id).astype(jnp.float32)[:, None]
    d3 = mask * delta[None, :]
    geo = data.geo.replace(
        p0=data.geo.p0 + d3,
        tri_geom=data.geo.tri_geom.at[:, 0:3].add(d3))
    return data.replace(geo=geo)


class TestGeometryGradients:
    def test_wall_translation_pixel_grads_vs_fd(self):
        """Translate the back wall along +z (toward the camera): every
        pixel seeing the wall gets closer geometry -> smooth radiometric
        change (no silhouette crossing for small h: the wall spans the
        full box cross-section). max_depth below rr_depth so no RR
        ratio can flip under the FD perturbation."""
        scene = make_box_scene(res=RES, spp=1)
        scene.integrator.fsd = False
        built = build_scene(scene)
        sensor = scene.sensors[0]
        pxy, jitter, sids = _lanes(RES)
        key = rng.make_base_key(7)
        BACK_WALL = 2                     # shapes[2] in make_box_scene

        def f(theta):
            data = translate_shape(built.data, BACK_WALL,
                                   theta * jnp.asarray([0.0, 0.0, 1.0]))
            pos, values, ok = trace_paths(
                data, pxy, jitter, key, sids, sensor=sensor,
                max_depth=2, eps=1e-4)
            return values.reshape(RES, RES, -1)

        jvp = jax.jit(lambda t: jax.jvp(f, (t,), (1.0,)))
        f0, g = jvp(0.0)
        h = 5e-3
        fp, _ = jvp(h)
        fm, _ = jvp(-h)
        g = np.asarray(g)
        fd = (np.asarray(fp) - np.asarray(fm)) / (2 * h)
        assert np.isfinite(g).all()
        assert (g != 0).any(), "no geometry gradient signal"
        scale = max(np.abs(fd).max(), 1e-30)
        close = np.isclose(g, fd, rtol=0.15, atol=0.03 * scale)
        # wall-edge pixels may graze the side walls; interior must match
        assert close.mean() > 0.97, \
            f"geometry grads: {close.mean():.1%} pixels match FD"

    def test_side_wall_translation_grads_vs_fd(self):
        """Second geometry class: translate the red left wall outward
        along −x. Same per-pixel FD oracle; exercises a different
        shading frame / colour channel than the back wall."""
        scene = make_box_scene(res=RES, spp=1)
        scene.integrator.fsd = False
        built = build_scene(scene)
        sensor = scene.sensors[0]
        pxy, jitter, sids = _lanes(RES)
        key = rng.make_base_key(9)
        LEFT_WALL = 3

        def f(theta):
            data = translate_shape(built.data, LEFT_WALL,
                                   theta * jnp.asarray([-1.0, 0.0, 0.0]))
            pos, values, ok = trace_paths(
                data, pxy, jitter, key, sids, sensor=sensor,
                max_depth=2, eps=1e-4)
            return values.reshape(RES, RES, -1)

        jvp = jax.jit(lambda t: jax.jvp(f, (t,), (1.0,)))
        f0, g = jvp(0.0)
        h = 5e-3
        fp, _ = jvp(h)
        fm, _ = jvp(-h)
        g = np.asarray(g)
        fd = (np.asarray(fp) - np.asarray(fm)) / (2 * h)
        assert np.isfinite(g).all()
        assert (g != 0).any()
        scale = max(np.abs(fd).max(), 1e-30)
        close = np.isclose(g, fd, rtol=0.15, atol=0.03 * scale)
        assert close.mean() > 0.95, \
            f"side-wall grads: {close.mean():.1%} pixels match FD"


class TestRoughnessGradients:
    def test_spm_roughness_pixel_grads_vs_fd(self):
        """Roughness gradient through the wave kernel: swap the box
        walls to an SPM conductor with a Gaussian profile rough enough
        that alpha_specular ~ 0 (the u<alpha lobe pick cannot flip under
        the FD perturbation); the PSD — and hence the image — varies
        smoothly with the roughness spectrum row scale."""
        from wave_tracer_tpu.bsdf import Material, SpmBSDF, SurfaceProfile
        from wave_tracer_tpu.spectrum.spectra import (
            ComplexUniformSpectrum, UniformSpectrum)
        from wave_tracer_tpu.texture.texture import ConstantSpectrumTexture

        scene = make_box_scene(res=RES, spp=1)
        ROUGH = 0.31837                   # marker value (reference mm units)
        metal = Material(
            bsdf=SpmBSDF(ior=ComplexUniformSpectrum(0.27 + 2.9j),
                         profile=SurfaceProfile(
                             type="gaussian",
                             roughness=ConstantSpectrumTexture(
                                 UniformSpectrum(ROUGH, 1.0, 1e9)))),
            twosided=True, name="metal")
        for sh in scene.shapes[:3]:       # floor/ceiling/back wall
            sh.material = metal
        built = build_scene(scene)
        sensor = scene.sensors[0]
        st = built.data.tables.spectra
        S = st.vals.shape[0]
        pxy, jitter, sids = _lanes(RES)
        key = rng.make_base_key(11)

        # find the roughness row by its marker value
        vals = np.asarray(st.vals)
        rows = np.zeros(S, np.float32)
        for i in range(S):
            if np.allclose(vals[i], ROUGH, atol=1e-5):
                rows[i] = 1.0
        assert rows.any(), "roughness spectrum row not found"
        row_mask = jnp.asarray(rows)

        def f(theta):
            rs = jnp.ones((S,)) + row_mask * (theta - 1.0)
            data = built.data.replace(
                tables=built.data.tables.replace(
                    spectra=st.replace(vals=st.vals * rs[:, None])))
            pos, values, ok = trace_paths_wave(
                data, pxy, jitter, key, sids, sensor=sensor,
                edge_table=data.edges, max_depth=2, eps=1e-4)
            return values.reshape(RES, RES, -1)

        jvp = jax.jit(lambda t: jax.jvp(f, (t,), (1.0,)))
        f1, g = jvp(1.0)
        h = 0.05
        fp, _ = jvp(1.0 + h)
        fm, _ = jvp(1.0 - h)
        g = np.asarray(g)
        fd = (np.asarray(fp) - np.asarray(fm)) / (2 * h)
        assert np.isfinite(g).all(), "NaN/inf roughness gradients"
        assert (g != 0).any()
        scale = max(np.abs(fd).max(), 1e-30)
        close = np.isclose(g, fd, rtol=0.15, atol=0.03 * scale)
        assert close.mean() > 0.97, \
            f"roughness grads: {close.mean():.1%} pixels match FD"


class TestBdptGradients:
    def test_emitter_scale_pixel_grads_vs_fd(self):
        """Emitter-power gradient through the full BDPT estimator
        (camera strategies + light-tracing splats): exactly linear in θ
        — every MIS weight is a radiance-free pdf ratio."""
        from wave_tracer_tpu.sensor import film as film_mod
        scene = make_box_scene(res=RES, spp=1)
        built = build_scene(scene)
        sensor = scene.sensors[0]
        st = built.data.tables.spectra
        S = st.vals.shape[0]
        et = built.data.emitters
        rows = np.zeros(S, np.float32)
        for sid in np.unique(np.asarray(et.spec_id)):
            if sid >= 0:
                rows[int(sid)] = 1.0
        assert rows.any()
        row_mask = jnp.asarray(rows)
        pxy, jitter, sids = _lanes(RES)
        key = rng.make_base_key(13)

        def f(theta):
            rs = jnp.ones((S,)) + row_mask * (theta - 1.0)
            data = built.data.replace(
                tables=built.data.tables.replace(
                    spectra=st.replace(vals=st.vals * rs[:, None])))
            pos, values, ok, (lt_pos, lt_val, lt_ok) = trace_bdpt(
                data, pxy, jitter, key, sids, sensor=sensor,
                max_depth=4, eps=1e-4)
            film = film_mod.make_film(RES, RES, values.shape[-1],
                                      sensor.rfilter_sigma)
            film = film_mod.splat(film, pos, values, ok)
            film = film_mod.splat_direct(film, lt_pos, lt_val, lt_ok)
            return film_mod.develop(film, 1.0)

        jvp = jax.jit(lambda t: jax.jvp(f, (t,), (1.0,)))
        f1, g = jvp(1.0)
        h = 0.05
        fp, _ = jvp(1.0 + h)
        fm, _ = jvp(1.0 - h)
        g = np.asarray(g)
        fd = (np.asarray(fp) - np.asarray(fm)) / (2 * h)
        assert np.isfinite(g).all(), "NaN/inf BDPT gradients"
        assert (g != 0).any()
        scale = max(np.abs(fd).max(), 1e-30)
        np.testing.assert_allclose(g, fd, rtol=0.12, atol=0.02 * scale)
