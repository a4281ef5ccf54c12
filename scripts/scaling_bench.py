"""Scaling-efficiency harness: beams/s at 1..N devices (BASELINE metric).

On real multi-chip hardware this measures DP scaling over ICI; without it
(this environment exposes one chip), run with
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py --cpu
to exercise the sharded code path on virtual devices (wall-clock numbers
are then meaningless for efficiency, but the harness, shardings and
collectives are the ones a pod run would use).

Prints one JSON line per mesh size:
{"devices": n, "paths_per_sec": v, "efficiency_vs_1": e}
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (virtual devices)")
    ap.add_argument("--lanes-per-device", type=int, default=1 << 13)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    sys.path.insert(0, os.path.join(root, "tests"))
    from test_render import make_box_scene
    from wave_tracer_tpu.parallel.dist import make_mesh, \
        sharded_render_step
    from wave_tracer_tpu.sampling import rng
    from wave_tracer_tpu.scene import build_scene
    from wave_tracer_tpu.sensor import film as film_mod

    scene = make_box_scene(res=64, spp=4)
    built = build_scene(scene)
    sensor = scene.sensors[0]
    key = rng.make_base_key(0)
    ndev_all = len(jax.devices())

    base = None
    n = 1
    while n <= ndev_all:
        mesh = make_mesh(n)
        step = sharded_render_step(mesh, sensor, max_depth=6, eps=1e-4)
        N = args.lanes_per_device * n
        pix = jnp.arange(N, dtype=jnp.int32) % (sensor.width
                                                * sensor.height)
        pxy = jnp.stack([pix % sensor.width, pix // sensor.width],
                        axis=-1)
        jitter = jnp.full((N, 2), 0.5)
        sids = jnp.zeros((N,), jnp.int32)
        film = film_mod.make_film(sensor.width, sensor.height, 3,
                                  sensor.rfilter_sigma)
        out = step(built.data, film, key, pxy, jitter, sids)   # compile
        out.value.block_until_ready()
        film = film_mod.make_film(sensor.width, sensor.height, 3,
                                  sensor.rfilter_sigma)
        t0 = time.time()
        for _ in range(args.reps):
            film = step(built.data, film, key, pxy, jitter, sids)
        film.value.block_until_ready()
        dt = (time.time() - t0) / args.reps
        v = N / dt
        if base is None:
            base = v
        print(json.dumps({
            "devices": n,
            "paths_per_sec": round(v, 1),
            "efficiency_vs_1": round(v / (base * n), 3)}), flush=True)
        n *= 2


if __name__ == "__main__":
    main()
