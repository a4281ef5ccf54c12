"""BDPT integrator: agreement with the unidirectional tracer.

Both estimators are consistent for the same scene, so their means must
agree on a simple diffuse box (the bdpt MIS is approximate in v1 — see
integrator/plt_bdpt.py — hence the generous tolerance)."""

import os

import numpy as np
import pytest

from tests.test_render import make_box_scene
from wave_tracer_tpu.render import render_scene
from wave_tracer_tpu.scene import build_scene

pytestmark = pytest.mark.skipif(
    not os.environ.get("WT_SLOW_TESTS"),
    reason="slow (two integrator compiles); set WT_SLOW_TESTS=1")


def test_bdpt_matches_path_mean():
    scene = make_box_scene(res=24, spp=16)
    scene.integrator.fsd = False
    built = build_scene(scene)

    scene.integrator.type = "plt_path"
    img_p, st_p = render_scene(built, spp=16, batch_lanes=1 << 13)
    assert st_p["mode"] == "ray"

    scene.integrator.type = "plt_bdpt"
    img_b, st_b = render_scene(built, spp=16, batch_lanes=1 << 13)
    assert st_b["mode"] == "bdpt"

    assert np.isfinite(img_b).all()
    ratio = img_b.mean() / img_p.mean()
    assert 0.8 < ratio < 1.25, f"bdpt/path mean ratio {ratio}"
    corr = np.corrcoef(img_p.ravel(), img_b.ravel())[0, 1]
    assert corr > 0.99
