"""Sobol LDS variance reduction: same spp, lower MSE than threefry
uniforms (the role of the reference's default sobolld scene sampler,
reference include/wt/sampler/sobolld.hpp:28-80)."""

import os

import numpy as np
import pytest

from tests.test_render import make_box_scene
from wave_tracer_tpu.render import render_scene
from wave_tracer_tpu.sampling import rng
from wave_tracer_tpu.scene import build_scene

pytestmark = pytest.mark.skipif(
    not os.environ.get("WT_SLOW_TESTS"),
    reason="slow validation (WT_SLOW_TESTS=1)")


def _mse(a, b):
    return float(np.mean((a - b) ** 2))


def test_sobol_reduces_mse():
    scene = make_box_scene(res=8, spp=8)
    built = build_scene(scene)
    # converged reference (sampler-agnostic at high spp)
    ref, _ = render_scene(built, spp=256, batch_lanes=1 << 11, seed=7)

    old = rng._SAMPLER
    try:
        rng._SAMPLER = "sobol"
        mse_sobol = np.mean([
            _mse(render_scene(built, spp=8, batch_lanes=1 << 11,
                              seed=s)[0], ref) for s in range(3)])
        rng._SAMPLER = "uniform"
        mse_unif = np.mean([
            _mse(render_scene(built, spp=8, batch_lanes=1 << 11,
                              seed=s)[0], ref) for s in range(3)])
    finally:
        rng._SAMPLER = old
    # LDS must not be worse; expect a real reduction
    assert mse_sobol < mse_unif, (mse_sobol, mse_unif)
