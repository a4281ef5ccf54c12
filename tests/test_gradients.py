"""Differentiability: pixel gradients w.r.t. scene parameters.

The north-star requirement (BASELINE.json): radiometric gradients — w.r.t.
BSDF/emitter/spectrum parameters — flow through the full transport;
discrete decisions (BVH hits, lobe/RR choices) are detached. Verified
against central finite differences.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("WT_SLOW_TESTS"),
    reason="slow (AD through the full integrator); set WT_SLOW_TESTS=1")

from tests.test_render import make_box_scene
from wave_tracer_tpu.integrator.path import trace_paths
from wave_tracer_tpu.sampling import rng
from wave_tracer_tpu.scene import build_scene


@pytest.fixture(scope="module")
def setup():
    scene = make_box_scene(res=8, spp=1)
    built = build_scene(scene)
    sensor = scene.sensors[0]
    N = 64
    pix = jnp.arange(N, dtype=jnp.int32) % 64
    pxy = jnp.stack([pix % 8, pix // 8], axis=-1)
    jitter = jnp.full((N, 2), 0.5)
    sids = jnp.arange(N, dtype=jnp.int32) // 64
    key = rng.make_base_key(3)

    def render_value(data):
        pos, values, ok = trace_paths(
            data, pxy, jitter, key, sids, sensor=sensor, max_depth=3,
            eps=1e-4)
        return jnp.mean(values)

    return built, render_value


def _loss_wrt_spectra_scale(built, render_value, row_scale):
    """Scale every baked spectrum row by row_scale (N_rows,) and render."""
    st = built.data.tables.spectra
    vals = st.vals * row_scale[:, None]
    data = built.data.replace(
        tables=built.data.tables.replace(
            spectra=st.replace(vals=vals)))
    return render_value(data)


class TestGradients:
    def test_reflectance_gradient_vs_fd(self, setup):
        built, render_value = setup
        S = built.data.tables.spectra.vals.shape[0]

        def loss(theta):
            return _loss_wrt_spectra_scale(built, render_value,
                                           jnp.ones((S,)) * theta)

        g = jax.grad(loss)(1.0)
        h = 0.05
        fd = (loss(1.0 + h) - loss(1.0 - h)) / (2 * h)
        assert np.isfinite(float(g))
        assert float(g) > 0           # brighter spectra → brighter image
        np.testing.assert_allclose(float(g), float(fd), rtol=0.2)

    def test_per_row_gradients_nonzero(self, setup):
        built, render_value = setup
        S = built.data.tables.spectra.vals.shape[0]

        g = jax.grad(lambda rs: _loss_wrt_spectra_scale(
            built, render_value, rs))(jnp.ones((S,)))
        g = np.asarray(g)
        assert np.isfinite(g).all()
        # at least the emitter spectrum and one reflectance row matter
        assert (np.abs(g) > 0).sum() >= 2

    def test_dominant_row_monotone(self, setup):
        """Scaling the most influential spectrum row up must brighten the
        image, and its gradient must be consistent with a secant."""
        built, render_value = setup
        S = built.data.tables.spectra.vals.shape[0]
        g = np.asarray(jax.grad(lambda rs: _loss_wrt_spectra_scale(
            built, render_value, rs))(jnp.ones((S,))))
        row = int(np.argmax(np.abs(g)))

        def loss(theta):
            rs = jnp.ones((S,)).at[row].set(theta)
            return _loss_wrt_spectra_scale(built, render_value, rs)

        l1 = float(loss(1.0))
        g1 = float(jax.grad(loss)(1.0))
        l2 = float(loss(2.0))
        assert g1 > 0 and l2 > l1
        # secant bounds the tangent for monotone convex/linear response
        assert 0.3 * g1 <= (l2 - l1) <= 4.0 * g1
