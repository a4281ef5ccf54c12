"""Physical-optics regression: double-slit interference fringe spacing.

Renders the reference double_slits scene (forward transport onto the
virtual plane) at reduced resolution and verifies the dominant fringe
period against the analytic two-slit prediction Δx = λ·L/d.
"""

import os

import numpy as np
import pytest

SCENES = "/root/reference/scenes"

pytestmark = [
    pytest.mark.skipif(not os.path.isdir(SCENES),
                       reason="reference scenes not mounted"),
    pytest.mark.skipif(not os.environ.get("WT_SLOW_TESTS"),
                       reason="slow; set WT_SLOW_TESTS=1"),
]


@pytest.mark.slow
def test_double_slit_fringe_spacing():
    from wave_tracer_tpu.render import render_scene
    from wave_tracer_tpu.scene import build_scene
    from wave_tracer_tpu.scene.xml import load_scene_xml

    res = 256
    s = load_scene_xml(f"{SCENES}/diffraction_simple/double_slits.xml",
                       {"pattern": "true", "res": str(res), "spp": "8"})
    built = build_scene(s)
    assert int(built.data.edges.count) > 4   # slit wedges classified
    img, stats = render_scene(built, spp=8, batch_lanes=1 << 14)
    inten = img[..., 0]
    assert np.isfinite(inten).all()
    assert (inten > 0).any()

    # average the central band, FFT for the fringe period
    H = inten.shape[0]
    prof = inten[H // 4: 3 * H // 4].mean(axis=0)
    band = prof[res // 4: 3 * res // 4]
    assert band.max() > 0
    b = band / band.max()
    f = np.abs(np.fft.rfft(b - b.mean()))

    # geometry (bits/geometry.xml): slit centres at ±(W+Wslit)/2·... →
    # x = ±0.325mm, separation d = W = 0.65mm; screen z=-15mm, plane
    # z≈+50mm → L = 65mm; Δx = λL/d = 0.05·65/0.65 = 5.0mm
    mm_per_px = 250.0 / res
    d_slit = 0.65
    expect_px = 0.05 * 65.0 / d_slit / mm_per_px
    expect_bin = len(b) / expect_px
    lo = max(int(expect_bin) - 2, 1)
    hi = int(expect_bin) + 3
    # spectral mass near the two-slit frequency must stand out against the
    # neighbouring background (excluding the DC/envelope bins)
    signal = f[lo:hi].max()
    bg = np.median(f[hi + 3: hi + 30])
    assert signal > 2.2 * bg, \
        f"no fringe peak near bin {expect_bin:.1f}: {signal} vs bg {bg}"
