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
