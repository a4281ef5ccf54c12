"""TPU probe: compacted classical renderer vs batched, bench shapes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def main():
    from wave_tracer_tpu.render.renderer import Renderer
    from wave_tracer_tpu.scene import build_scene
    from wave_tracer_tpu.scene.xml import load_scene_xml

    print("devices:", jax.devices(), flush=True)
    scene = load_scene_xml("/root/reference/scenes/cornell-box/box.xml",
                           {"res": "256", "spp": "16"})
    scene.integrator.max_depth = 8
    scene.integrator.type = "plt_path"
    scene.integrator.fsd = False
    built = build_scene(scene)

    r = Renderer(built, batch_lanes=1 << 14, compact=True,
                 fuse_batches=False)
    t0 = time.perf_counter()
    img, st = r.render_sensor(0, 4)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s "
          f"({st['paths_per_sec']:.0f} paths/s incl compile)", flush=True)
    assert np.isfinite(img).all()
    t0 = time.perf_counter()
    img, st = r.render_sensor(0, 16)
    dt = time.perf_counter() - t0
    print(f"PROBE compact16 {dt:.2f}s ({st['paths_per_sec']:.0f} paths/s)",
          flush=True)

    r2 = Renderer(built, batch_lanes=1 << 14, compact=False,
                  fuse_batches=False)
    img, st = r2.render_sensor(0, 4)     # compile
    t0 = time.perf_counter()
    img, st = r2.render_sensor(0, 16)
    dt = time.perf_counter() - t0
    print(f"PROBE batched16 {dt:.2f}s ({st['paths_per_sec']:.0f} paths/s)",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
