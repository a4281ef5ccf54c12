"""Benchmark: cornell-box backward wave-path throughput (beams/s/chip).

Run by the driver on real TPU hardware; prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numeric throughput (BASELINE.md) — its only
statement is that wave tracing costs ~5-20x classical ray tracing on a
powerful CPU node. As the comparable baseline we take 100k paths/s for a
CPU node running the reference (mid-range estimate from its published
slowdown factor over typical embree-class CPU ray tracing of ~1-2M rays/s
on such scenes); vs_baseline = value / 100_000.
"""

import json
import os
import signal
import sys
import time

BASELINE_PATHS_PER_SEC = 100_000.0
WATCHDOG_SECS = 1500

_partial = {"value": None}


def _watchdog(signum, frame):
    """TPU-side compiles occasionally wedge (axon tunnel); emit the best
    number measured so far instead of hanging the driver."""
    v = _partial["value"] or 0.0
    print(json.dumps({
        "metric": "beams_per_sec_cornell_box_bwd",
        "value": round(v, 1),
        "unit": "beams/s/chip",
        "vs_baseline": round(v / BASELINE_PATHS_PER_SEC, 3),
    }))
    sys.stdout.flush()
    os._exit(0)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(
                          __file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from wave_tracer_tpu.render import render_scene
    from wave_tracer_tpu.scene import build_scene
    from wave_tracer_tpu.scene.xml import load_scene_xml

    scene_path = "/root/reference/scenes/cornell-box/box.xml"
    if os.path.isfile(scene_path):
        scene = load_scene_xml(scene_path, {"res": "256", "spp": "16"})
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
        from test_render import make_box_scene
        scene = make_box_scene(res=256, spp=16)
    scene.integrator.max_depth = 8
    built = build_scene(scene)

    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(WATCHDOG_SECS)

    # first pass compiles; the second, identically-shaped pass is timed.
    # 16k lanes/batch: XLA compile of this kernel degrades badly at very
    # large lane counts; 16k keeps the chip busy at ~0.5s/launch.
    LANES = 1 << 14
    img, stats = render_scene(built, spp=16, batch_lanes=LANES)
    _partial["value"] = stats["paths_per_sec"]
    img, stats = render_scene(built, spp=16, batch_lanes=LANES)
    assert np.isfinite(img).all()
    signal.alarm(0)

    value = stats["paths_per_sec"]
    print(json.dumps({
        "metric": "beams_per_sec_cornell_box_bwd",
        "value": round(value, 1),
        "unit": "beams/s/chip",
        "vs_baseline": round(value / BASELINE_PATHS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
