"""Compacted persistent-wavefront renderer vs the batched renderer.

RNG streams are keyed by (pixel, sample, depth, use), so the compacted
classical renderer traces the SAME paths as the batched one — images
agree to splat-order rounding. The wave kernel's hybrid-traversal
classification sits on float thresholds (segment-boundary acceptance,
region membership) that can flip under different XLA fusion, so a small
fraction of wave lanes legitimately diverge; agreement there is
statistical.
"""

import numpy as np
import pytest

from tests.test_render import make_box_scene
from wave_tracer_tpu.render import render_scene
from wave_tracer_tpu.render.renderer import Renderer
from wave_tracer_tpu.scene import build_scene


@pytest.fixture(scope="module")
def built():
    scene = make_box_scene(res=16, spp=8)
    return scene, build_scene(scene)


def test_classical_compact_matches_batched(built):
    scene, b = built
    scene.integrator.fsd = False
    img_c, st_c = render_scene(b, spp=8, batch_lanes=1 << 11)
    assert st_c["mode"] == "ray-compact"
    r = Renderer(b, batch_lanes=1 << 11, compact=False)
    img_b, st_b = r.render_sensor(0, 8)
    assert st_b["mode"] == "ray"
    np.testing.assert_allclose(img_c, img_b, rtol=2e-3,
                               atol=2e-3 * img_b.max())


def test_wave_compact_statistically_matches_batched(built):
    scene, b = built
    scene.integrator.fsd = True
    img_c, st_c = render_scene(b, spp=8, batch_lanes=1 << 11)
    assert st_c["mode"] == "wave-compact"
    r = Renderer(b, batch_lanes=1 << 11, compact=False)
    img_b, st_b = r.render_sensor(0, 8)
    assert st_b["mode"] == "wave"
    assert np.isfinite(img_c).all()
    # a few lanes flip traversal classification and their splat windows
    # spread the difference; the estimators must still agree tightly in
    # distribution (measured: ratio 0.983, corr 0.99992 at 16px spp=8)
    ratio = img_c.mean() / img_b.mean()
    assert 0.9 < ratio < 1.12, f"wave compact/batched mean ratio {ratio}"
    corr = np.corrcoef(img_c.ravel(), img_b.ravel())[0, 1]
    assert corr > 0.995, f"correlation {corr}"


def test_compact_interrupt_resume(built):
    """Interrupted compact renders leave a valid film and resume via
    spp_start (the checkpoint/interrupt contract)."""
    scene, b = built
    scene.integrator.fsd = False
    calls = []

    def interrupt():
        calls.append(1)
        return "terminate" if len(calls) >= 2 else None

    img, st, r = render_scene(b, spp=8, batch_lanes=1 << 11,
                              interrupt=interrupt, return_renderer=True)
    assert st["interrupted"]
    assert 0 < st["spp_done"] < 8
    assert np.isfinite(img).all()
    # resume to completion
    img2, st2 = render_scene(b, spp=8, batch_lanes=1 << 11,
                             init_film=r.last_film,
                             spp_start=st["spp_done"])
    assert not st2["interrupted"]
    # must equal an uninterrupted full render exactly (same id ranges)
    img3, _ = render_scene(b, spp=8, batch_lanes=1 << 11)
    np.testing.assert_allclose(img2, img3, rtol=1e-5,
                               atol=1e-6 * img3.max())


def test_stepped_matches_while_loop(built, monkeypatch):
    """The host-stepped persistent driver (the TPU path: one jitted
    bounce per dispatch, state donated) must produce bit-identical films
    to the single-dispatch device while_loop — same pool schedule, same
    RNG streams, same splat order."""
    scene, b = built
    for fsd in (False, True):
        scene.integrator.fsd = fsd
        monkeypatch.setenv("WT_COMPACT_MODE", "while")
        img_w, st_w = render_scene(b, spp=4, batch_lanes=1 << 11)
        monkeypatch.setenv("WT_COMPACT_MODE", "stepped")
        img_s, st_s = render_scene(b, spp=4, batch_lanes=1 << 11)
        assert st_w["mode"] == st_s["mode"]
        np.testing.assert_allclose(img_s, img_w, rtol=1e-6,
                                   atol=1e-7 * max(img_w.max(), 1e-30))
        # device counters agree too (identical pool schedule)
        cw = st_w.get("device_counters", {})
        cs = st_s.get("device_counters", {})
        for k in ("rays_cast", "surface_interactions"):
            if k in cw:
                np.testing.assert_allclose(cs[k], cw[k], rtol=1e-6)
