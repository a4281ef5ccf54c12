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
    scene.integrator.max_depth = 16       # the reference box runs 16
    built = build_scene(scene)

    scene.integrator.type = "plt_path"
    img_p, st_p = render_scene(built, spp=16, batch_lanes=1 << 13)
    assert st_p["mode"].startswith("ray")

    scene.integrator.type = "plt_bdpt"
    img_b, st_b = render_scene(built, spp=16, batch_lanes=1 << 13)
    assert st_b["mode"] == "bdpt"

    assert np.isfinite(img_b).all()
    ratio = img_b.mean() / img_p.mean()
    # exact-pdf MIS chains agree to ~1% at depth 16 (measured 1.007);
    # the bound leaves room for MC noise only
    assert 0.95 < ratio < 1.06, f"bdpt/path mean ratio {ratio}"
    corr = np.corrcoef(img_p.ravel(), img_b.ravel())[0, 1]
    assert corr > 0.995


def test_bdpt_fsd_energy_sane():
    """With Fraunhofer FSD on, the box render stays finite and within a
    modest factor of the FSD-off render (FSD redistributes power, it must
    not create or destroy it wholesale)."""
    scene = make_box_scene(res=16, spp=8)
    scene.integrator.type = "plt_bdpt"
    scene.integrator.fsd = False
    built = build_scene(scene)
    img0, _ = render_scene(built, spp=8, batch_lanes=1 << 11)

    scene.integrator.fsd = True
    built = build_scene(scene)
    img1, st = render_scene(built, spp=8, batch_lanes=1 << 11)
    assert st["mode"] == "bdpt"
    assert np.isfinite(img1).all()
    ratio = img1.mean() / img0.mean()
    assert 0.7 < ratio < 1.4, f"bdpt fsd on/off mean ratio {ratio}"


def test_bdpt_polarimetric_stokes():
    """Polarimetric BDPT: Stokes output is physical (|pol| ≤ I) and the
    I channel tracks the non-polarimetric bdpt render."""
    scene = make_box_scene(res=16, spp=8)
    scene.integrator.type = "plt_bdpt"
    scene.integrator.fsd = False
    scene.sensors[0].polarimetric = True
    built = build_scene(scene)
    img, st = render_scene(built, spp=8, batch_lanes=1 << 11)
    assert st["mode"] == "bdpt"
    assert img.shape[-1] == 12
    st4 = img.reshape(*img.shape[:2], 3, 4)
    I = st4[..., 0]
    pol = np.sqrt((st4[..., 1:] ** 2).sum(-1))
    lit = I > 1e-3 * I.max()
    assert (pol[lit] <= I[lit] * 1.05 + 1e-12).all()
    assert np.isfinite(st4).all()

    scene.sensors[0].polarimetric = False
    built = build_scene(scene)
    ref, _ = render_scene(built, spp=8, batch_lanes=1 << 11)
    np.testing.assert_allclose(I, ref[..., :3], rtol=1e-3,
                               atol=1e-3 * ref.max())
