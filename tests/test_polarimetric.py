"""Polarimetric rendering: Stokes outputs behave physically."""

import numpy as np
import pytest

from tests.test_render import make_box_scene
from wave_tracer_tpu.render import render_scene
from wave_tracer_tpu.scene import build_scene


@pytest.fixture(scope="module")
def stokes_render():
    scene = make_box_scene(res=16, spp=8)
    scene.sensors[0].polarimetric = True
    built = build_scene(scene)
    img, stats = render_scene(built, spp=8, batch_lanes=1 << 11)
    return scene, img


class TestPolarimetric:
    def test_channel_layout(self, stokes_render):
        scene, img = stokes_render
        # 3 response channels × 4 Stokes components
        assert img.shape[-1] == 12

    def test_intensity_matches_scalar_render(self, stokes_render):
        scene, img = stokes_render
        st4 = img.reshape(*img.shape[:2], 3, 4)
        I = st4[..., 0]
        scene.sensors[0].polarimetric = False
        built = build_scene(scene)
        ref, _ = render_scene(built, spp=8, batch_lanes=1 << 11)
        np.testing.assert_allclose(I, ref, rtol=1e-3,
                                   atol=1e-3 * ref.max())

    def test_physical_stokes(self, stokes_render):
        scene, img = stokes_render
        st4 = img.reshape(*img.shape[:2], 3, 4)
        I = st4[..., 0]
        pol = np.sqrt((st4[..., 1:] ** 2).sum(-1))
        # degree of polarization within [0, 1] (+ tolerance for noise)
        lit = I > 1e-3 * I.max()
        assert (pol[lit] <= I[lit] * 1.05 + 1e-12).all()
        assert np.isfinite(st4).all()
