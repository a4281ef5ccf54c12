"""Wave-kernel TPU probe: compile + throughput of trace_paths_wave with
the hybrid cone traversal, at bench shapes (cornell-box, 16k lanes)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

LANES = int(os.environ.get("WT_PROBE_LANES", 1 << 14))
DEPTH = 8


def main():
    from wave_tracer_tpu.integrator.plt_path import trace_paths_wave
    from wave_tracer_tpu.sampling import rng
    from wave_tracer_tpu.scene import build_scene
    from wave_tracer_tpu.scene.xml import load_scene_xml

    print("devices:", jax.devices(), flush=True)
    scene = load_scene_xml("/root/reference/scenes/cornell-box/box.xml",
                           {"res": "256", "spp": "16"})
    scene.integrator.max_depth = DEPTH
    built = build_scene(scene)
    data = built.data.replace(spectral=built.spectral_per_sensor[0])
    sensor = scene.sensors[0]
    print("tris:", data.geo.num_tris, "edges:", int(data.edges.count),
          flush=True)

    N = LANES
    pix = jnp.arange(N, dtype=jnp.int32) % (sensor.width * sensor.height)
    pxy = jnp.stack([pix % sensor.width, pix // sensor.width], axis=-1)
    jitter = jnp.full((N, 2), 0.5, jnp.float32)
    sids = jnp.zeros((N,), jnp.int32)
    key = rng.make_base_key(0)
    eps = 1e-4 * scene.world_radius()

    @jax.jit
    def wave(data, pxy, jitter, key, sids):
        pos, v, ok = trace_paths_wave(
            data, pxy, jitter, key, sids, sensor=sensor,
            edge_table=data.edges, max_depth=DEPTH, eps=eps)
        return v

    t0 = time.perf_counter()
    out = wave(data, pxy, jitter, key, sids)
    jax.block_until_ready(out)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    assert np.isfinite(np.asarray(out)).all()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = wave(data, pxy, jitter, key, sids)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"PROBE wave8 {dt:.4f} ({N/dt:.0f} beams/s)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
