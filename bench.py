"""Benchmark: wave-optical beam throughput on the cornell box (headline)
plus classical-kernel secondaries, on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "secondary": {...}}

Baselines (BASELINE.md): the reference publishes no numeric throughput.
Its only statement is that wave tracing costs ~5-20x classical ray
tracing on a powerful CPU node. We take 100k paths/s as the classical
CPU estimate (mid-range from typical embree-class throughput on such
scenes) and 10k beams/s (the geometric middle of the 5-20x slowdown)
as the wave-mode baseline. vs_baseline = wave beams/s / 10_000.

Structure: measurements run in a child process with a hard timeout —
the axon TPU backend occasionally wedges inside compile RPCs where no
in-process signal can fire; the parent then reports the best partial
numbers instead of hanging the driver.
"""

import json
import os
import subprocess
import sys

BASELINE_WAVE_BEAMS_PER_SEC = 10_000.0
BASELINE_CLASSICAL_PATHS_PER_SEC = 100_000.0
CHILD_TIMEOUT_SECS = 1800


def _load_box(defines):
    from wave_tracer_tpu.scene.xml import load_scene_xml
    scene_path = "/root/reference/scenes/cornell-box/box.xml"
    if os.path.isfile(scene_path):
        return load_scene_xml(scene_path, defines)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from test_render import make_box_scene
    return make_box_scene(res=int(defines["res"]),
                          spp=int(defines["spp"]))


def child():
    import numpy as np

    from wave_tracer_tpu.render import render_scene
    from wave_tracer_tpu.scene import build_scene

    # 16k lanes/batch: XLA compile degrades badly at very large lane
    # counts on this backend. First pass compiles, second is timed
    # (compiled kernels are cached per sensor+config).
    LANES = 1 << 14

    # ---- headline: wave-optical transport (plt_path + UTD FSD,
    # hybrid ballistic/diffusive cone traversal). Warm-up and timed
    # renders use the SAME spp so the compiled kernel (shape depends on
    # the pixel batching) is reused.
    scene = _load_box({"res": "256", "spp": "16"})
    scene.integrator.max_depth = 8
    scene.integrator.type = "plt_path"
    scene.integrator.fsd = True
    built = build_scene(scene)
    # device_stats=False mirrors the reference's default build (its
    # ads/integrator counters are compile-time-gated to Profile builds,
    # CMakeLists:393-396) — counters stay available via --stats / tests
    img, stats = render_scene(built, spp=2, batch_lanes=LANES,
                              fuse_batches=False, device_stats=False)
    print("PARTIAL wave", stats["paths_per_sec"], flush=True)
    img, stats = render_scene(built, spp=8, batch_lanes=LANES,
                              fuse_batches=False, device_stats=False)
    assert np.isfinite(img).all()
    print("RESULT wave", stats["paths_per_sec"], flush=True)

    wave_built = built

    # ---- secondary: classical kernel (compacted persistent wavefront)
    scene.integrator.fsd = False
    built = build_scene(scene)
    img, stats = render_scene(built, spp=2, batch_lanes=LANES,
                              fuse_batches=False, device_stats=False)
    print("PARTIAL classical", stats["paths_per_sec"], flush=True)
    img, stats = render_scene(built, spp=16, batch_lanes=LANES,
                              fuse_batches=False, device_stats=False)
    assert np.isfinite(img).all()
    print("RESULT classical", stats["paths_per_sec"], flush=True)

    # ---- secondary: classical on ~100k triangles (procedural stand-in
    # for the box's git-lfs-stub dragon: a tessellation-192 icosphere,
    # 81920 tris — exercises the intersector at scale)
    from wave_tracer_tpu.geometry import mesh as mesh_mod
    from wave_tracer_tpu.scene.model import Shape
    mat = scene.shapes[0].material
    scene.shapes.append(Shape(
        mesh_mod.sphere([2.78, 1.2, 2.78], 0.9, tessellation=192), mat))
    built = build_scene(scene)
    img, stats = render_scene(built, spp=2, batch_lanes=LANES,
                              fuse_batches=False, device_stats=False)
    print("PARTIAL tri100k", stats["paths_per_sec"], flush=True)
    img, stats = render_scene(built, spp=8, batch_lanes=LANES,
                              fuse_batches=False, device_stats=False)
    assert np.isfinite(img).all()
    print("RESULT tri100k", stats["paths_per_sec"], flush=True)

    # ---- secondary: WAVE kernel at ~100k triangles (clustered
    # two-level cone/edge sweeps; reference wave renders of sponza-class
    # scenes are exactly this regime)
    scene.integrator.fsd = True
    built = build_scene(scene)
    img, stats = render_scene(built, spp=1, batch_lanes=LANES,
                              fuse_batches=False, device_stats=False)
    print("PARTIAL wave100k", stats["paths_per_sec"], flush=True)
    img, stats = render_scene(built, spp=4, batch_lanes=LANES,
                              fuse_batches=False, device_stats=False)
    assert np.isfinite(img).all()
    print("RESULT wave100k", stats["paths_per_sec"], flush=True)

    # ---- secondary: plt_bdpt on the 11k-tri box — the integrator
    # box.xml actually declares (reference scenes/cornell-box/box.xml:8).
    # Bidirectional walks + Fraunhofer FSD + light-image splats; batched
    # driver (the fixed-vertex-array subpath walks do not fit the refill
    # compaction model — renderer.py policy note). Placed last so a
    # wedged bdpt compile cannot cost the other secondaries.
    wave_built.scene.integrator.type = "plt_bdpt"
    img, stats = render_scene(wave_built, spp=1, batch_lanes=LANES,
                              fuse_batches=False, device_stats=False)
    print("PARTIAL bdpt", stats["paths_per_sec"], flush=True)
    img, stats = render_scene(wave_built, spp=4, batch_lanes=LANES,
                              fuse_batches=False, device_stats=False)
    assert np.isfinite(img).all()
    print("RESULT bdpt", stats["paths_per_sec"], flush=True)


def main():
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    best = {}
    try:
        out, _ = proc.communicate(timeout=CHILD_TIMEOUT_SECS)
    except subprocess.TimeoutExpired:
        proc.kill()
        out, _ = proc.communicate()
    # RESULT (the timed run, warm caches) wins; PARTIAL (the warm-up,
    # including compile time in its window) is only a fallback for a
    # child that wedged before finishing the timed pass.
    partial = {}
    for line in (out or "").splitlines():
        parts = line.split()
        if len(parts) == 3 and parts[0] in ("PARTIAL", "RESULT"):
            try:
                v = float(parts[2])
            except ValueError:
                continue
            if parts[0] == "RESULT":
                best[parts[1]] = v
            else:
                partial[parts[1]] = v
    for key_, v in partial.items():
        best.setdefault(key_, v)
    wave = best.get("wave", 0.0)
    print(json.dumps({
        "metric": "wave_beams_per_sec_cornell_box_bwd",
        "value": round(wave, 1),
        "unit": "beams/s/chip",
        "vs_baseline": round(wave / BASELINE_WAVE_BEAMS_PER_SEC, 3),
        "secondary": {
            "classical_paths_per_sec": round(best.get("classical", 0.0),
                                             1),
            "classical_vs_baseline": round(
                best.get("classical", 0.0)
                / BASELINE_CLASSICAL_PATHS_PER_SEC, 3),
            "classical_100k_tris_paths_per_sec": round(
                best.get("tri100k", 0.0), 1),
            "wave_100k_tris_beams_per_sec": round(
                best.get("wave100k", 0.0), 1),
            "bdpt_paths_per_sec": round(best.get("bdpt", 0.0), 1),
        },
    }))


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        main()
