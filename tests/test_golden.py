"""Self-golden regression: the 16px box render must stay stable.

Catches unintended behaviour changes across refactors (the analogue of the
reference's published scene images serving as visual goldens, SURVEY §4).
Deterministic: the counter-based RNG keys every path by (pixel, sample).
"""

import os

import numpy as np
import pytest

from tests.test_render import make_box_scene
from wave_tracer_tpu.render import render_scene
from wave_tracer_tpu.scene import build_scene

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "box16.npy")


@pytest.mark.skipif(not os.path.isfile(GOLDEN), reason="no golden stored")
def test_box16_matches_golden():
    scene = make_box_scene(res=16, spp=8)
    built = build_scene(scene)
    img, _ = render_scene(built, spp=8, batch_lanes=1 << 11)
    ref = np.load(GOLDEN)
    # identical RNG streams → near-bitwise (float-accumulation order may
    # differ across backends/versions, hence the small tolerance)
    np.testing.assert_allclose(img, ref, rtol=2e-3, atol=2e-3 * ref.max())


def _check_or_create(path, img, frac_ok=1.0, rtol=2e-3, atol_scale=2e-3):
    if not os.path.isfile(path):
        np.save(path, img.astype(np.float32))
        pytest.skip("golden created")
    ref = np.load(path)
    assert ref.shape == img.shape
    close = np.isclose(img, ref, rtol=rtol, atol=atol_scale * ref.max())
    assert close.mean() >= frac_ok, \
        f"only {close.mean():.1%} of texels match the golden"
    np.testing.assert_allclose(img.mean(), ref.mean(), rtol=5e-3)


def test_wave16_matches_golden():
    """Wave-mode (plt_path + UTD FSD + hybrid traversal) self-golden —
    drift in the flagship kernel fails CI."""
    scene = make_box_scene(res=16, spp=8)
    scene.integrator.fsd = True
    built = build_scene(scene)
    img, stats = render_scene(built, spp=8, batch_lanes=1 << 11)
    assert stats["mode"].startswith("wave")
    golden = os.path.join(os.path.dirname(__file__), "goldens",
                          "wave16.npy")
    # round-5: the FSD boundary window (wave/fsd.py build_aperture)
    # ramps edge contributions to zero at the envelope edge, so
    # membership flips no longer produce O(1) changes — threshold
    # tightened 0.98 → 0.995 (VERDICT r4 item 3)
    _check_or_create(golden, img, frac_ok=0.995)


def test_coverage_slits_matches_golden():
    """Coverage-mode (forward light tracing onto a virtual plane,
    double-slit fringes) self-golden."""
    from wave_tracer_tpu.scene.xml import load_scene_xml
    scene = load_scene_xml(
        "/root/reference/scenes/diffraction_simple/double_slits.xml",
        {"pattern": "true", "res": "32", "spp": "2"})
    built = build_scene(scene)
    img, stats = render_scene(built, spp=2, batch_lanes=1 << 12)
    assert stats["mode"].startswith("forward")
    assert np.isfinite(img).all()
    golden = os.path.join(os.path.dirname(__file__), "goldens",
                          "slits32.npy")
    # round-5: tightened 0.95 → 0.99 after the FSD boundary window made
    # edge-set membership flips continuous (VERDICT r4 item 3); the
    # residual allowance covers RIS-winner discreteness in the
    # Fraunhofer redirects
    _check_or_create(golden, img, frac_ok=0.99, rtol=5e-3,
                     atol_scale=5e-3)
