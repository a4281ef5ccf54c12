"""Scaling-efficiency harness: beams/s at 1..N devices (BASELINE metric).

Covers ALL FOUR sharded integrator steps (classical, wave, forward,
bdpt; parallel/dist.py). On real multi-chip hardware this measures DP
scaling over ICI; without it (this environment exposes one chip), run

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py --cpu

to exercise the sharded code paths on virtual devices (wall-clock
numbers are then meaningless for efficiency, but the harness, shardings
and collectives are the ones a pod run would use).

Multi-host pods: run the same command on every host with --distributed
(plus --coordinator/--process-id/--num-processes off-TPU); the mesh then
spans the pod and lanes are fed per host via parallel.launch helpers.

Prints one JSON line per (kernel, mesh size):
{"kernel": k, "devices": n, "paths_per_sec": v, "efficiency_vs_1": e}
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (virtual devices)")
    ap.add_argument("--lanes-per-device", type=int, default=1 << 13)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--kernels", default="classical,wave,forward,bdpt")
    ap.add_argument("--sizes", default=None,
                    help="comma-separated mesh sizes (default 1,2,4..N);"
                         " each (kernel, size) pair compiles once — trim"
                         " for smoke runs, e.g. --sizes 8")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: initialize jax.distributed")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    sys.path.insert(0, os.path.join(root, "tests"))
    from wave_tracer_tpu.parallel import launch as launch_mod
    if args.distributed:
        launch_mod.initialize_distributed(
            coordinator=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id)

    from test_render import make_box_scene
    from wave_tracer_tpu.parallel.dist import (make_mesh,
                                               sharded_bdpt_step,
                                               sharded_forward_step,
                                               sharded_render_step,
                                               sharded_wave_step)
    from wave_tracer_tpu.sampling import rng
    from wave_tracer_tpu.scene import build_scene
    from wave_tracer_tpu.scene.xml import load_scene_xml
    from wave_tracer_tpu.sensor import film as film_mod

    scene = make_box_scene(res=64, spp=4)
    built = build_scene(scene)
    sensor = scene.sensors[0]

    # the forward kernel needs a virtual-plane sensor: double_slits
    slits_path = ("/root/reference/scenes/diffraction_simple/"
                  "double_slits.xml")
    fwd_built = fwd_sensor = None
    if os.path.isfile(slits_path):
        fwd_scene = load_scene_xml(slits_path, {"pattern": "true",
                                                "res": "64", "spp": "2"})
        fwd_built = build_scene(fwd_scene)
        fwd_sensor = fwd_scene.sensors[0]

    key = rng.make_base_key(0)
    ndev_all = len(jax.devices())
    kernels = [k.strip() for k in args.kernels.split(",") if k.strip()]

    def lane_inputs(N, sensor_):
        pix = jnp.arange(N, dtype=jnp.int32) % (sensor_.width
                                                * sensor_.height)
        pxy = jnp.stack([pix % sensor_.width, pix // sensor_.width],
                        axis=-1)
        return (pxy, jnp.full((N, 2), 0.5), jnp.zeros((N,), jnp.int32),
                jnp.ones((N,), bool))

    def run_kernel(kname, n):
        mesh = make_mesh(n)
        if kname == "forward":
            if fwd_built is None:
                return None
            data, sensor_ = fwd_built.data, fwd_sensor
            step = sharded_forward_step(mesh, sensor_, max_depth=4,
                                        eps=1e-5)
            C = sensor_.response.channels
        else:
            data, sensor_ = built.data, sensor
            C = 3
            if kname == "classical":
                step = sharded_render_step(mesh, sensor_, max_depth=6,
                                           eps=1e-4)
            elif kname == "wave":
                step = sharded_wave_step(mesh, sensor_, max_depth=6,
                                         eps=1e-4)
            elif kname == "bdpt":
                step = sharded_bdpt_step(mesh, sensor_, max_depth=6,
                                         eps=1e-4)
            else:
                raise SystemExit(f"unknown kernel {kname}")
        N = args.lanes_per_device * n
        film = film_mod.make_film(sensor_.width, sensor_.height, C,
                                  sensor_.rfilter_sigma)
        if kname == "forward":
            lane_ids = jnp.arange(N, dtype=jnp.int32)
            sids = jnp.zeros((N,), jnp.int32)
            live = jnp.ones((N,), bool)
            inputs = (lane_ids, sids, live)
        else:
            inputs = lane_inputs(N, sensor_)
        film = step(data, film, key, *inputs)     # compile
        film.value.block_until_ready()
        film = film_mod.make_film(sensor_.width, sensor_.height, C,
                                  sensor_.rfilter_sigma)
        t0 = time.time()
        for _ in range(args.reps):
            film = step(data, film, key, *inputs)
        film.value.block_until_ready()
        dt = (time.time() - t0) / args.reps
        return N / dt

    if args.sizes:
        sizes = [int(s) for s in args.sizes.split(",")]
    else:
        sizes, n = [], 1
        while n <= ndev_all:
            sizes.append(n)
            n *= 2
    for kname in kernels:
        base = None
        for n in sizes:
            if n > ndev_all:
                break
            v = run_kernel(kname, n)
            if v is None:
                break
            if base is None:
                base = v
            print(json.dumps({
                "kernel": kname,
                "devices": n,
                "paths_per_sec": round(v, 1),
                "efficiency_vs_1": round(v * sizes[0] / (base * n), 3)}),
                flush=True)


if __name__ == "__main__":
    main()
