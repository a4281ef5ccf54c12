"""Command-line frontend: `python -m wave_tracer_tpu render scene.xml`.

Mirrors the reference CLI surface (reference src/main.cpp:785-973):
subcommands `render` and `version`; options for output dir, `-D`
defines, `--mesh_scale`, spp override, verbosity, stats. Output per
sensor: linear EXR + tonemapped PNG (src/main.cpp:404-482).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def jnp_asarray(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


def jnp_ones(shape):
    import jax.numpy as jnp
    return jnp.ones(shape)

__version__ = "0.1.0"


def parse_defines(pairs):
    out = {}
    for p in pairs or []:
        for item in p.split(","):
            if not item:
                continue
            if "=" not in item:
                raise SystemExit(f"bad define {item!r}; expected name=value")
            k, v = item.split("=", 1)
            out[k.strip()] = v.strip()
    return out


def cmd_render(args):
    import jax
    distributed = getattr(args, "distributed", False)
    if distributed:
        # must precede any backend/device use (multi-controller launch:
        # same command on every host — parallel/launch.py recipes)
        from wave_tracer_tpu.parallel.launch import (
            initialize_distributed)
        initialize_distributed(coordinator=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    from wave_tracer_tpu.render import render_scene
    from wave_tracer_tpu.render.output import write_exr, write_png
    from wave_tracer_tpu.scene import build_scene
    from wave_tracer_tpu.scene.xml import load_scene_xml
    from wave_tracer_tpu.sensor.tonemap import Tonemap, srgb_encode

    t0 = time.time()
    defines = parse_defines(args.define)
    scene = load_scene_xml(args.scene, defines,
                           mesh_scale=args.mesh_scale)
    if getattr(args, "ray_tracing", False):
        # force classical ray tracing (reference src/main.cpp's
        # --ray-tracing flag: disables wave transport/FSD globally)
        scene.integrator.ray_trace_only = True
    print(f"[wave_tracer_tpu] loaded '{os.path.basename(args.scene)}': "
          f"{len(scene.shapes)} shapes, {len(scene.emitters)} emitters, "
          f"{len(scene.sensors)} sensors")
    built = build_scene(scene)
    ntris = built.data.geo.num_tris
    print(f"[wave_tracer_tpu] scene built: {ntris} triangles, "
          f"BVH depth {built.bvh.depth()} ({time.time() - t0:.1f}s)")

    outdir = args.output or "."
    os.makedirs(outdir, exist_ok=True)

    # SIGINT → graceful terminate: finish the in-flight chunk, develop
    # and write the completed work + a resumable checkpoint (the
    # reference's terminate interrupt, src/main.cpp:231-235,
    # src/scene/render.cpp:328-368). A second Ctrl-C aborts immediately.
    import signal
    sigint_state = {"count": 0}
    prev_handler = signal.getsignal(signal.SIGINT)

    def on_sigint(signum, frame):
        sigint_state["count"] += 1
        if sigint_state["count"] >= 2:
            signal.signal(signal.SIGINT, prev_handler)
            raise KeyboardInterrupt
        print("\n[wave_tracer_tpu] interrupt: finishing current batch, "
              "writing completed work (Ctrl-C again to abort)",
              flush=True)

    ui = None
    if getattr(args, "ui", None) is not None:
        # live web frontend (util/ui.py — the reference renderui/GUI
        # analogue, src/util/gui/gui.cpp): pause/resume/terminate/
        # capture drive the same interrupt system as Ctrl-C
        from wave_tracer_tpu.util.ui import RenderUI
        ui = RenderUI()
        port = ui.serve(args.ui)
        print(f"[wave_tracer_tpu] live UI at http://127.0.0.1:{port}/")

    def poll_interrupt():
        if sigint_state["count"]:
            return "terminate"
        return ui.interrupt() if ui is not None else None

    signal.signal(signal.SIGINT, on_sigint)

    if ui is not None:
        ui.set_scene_info(dict(
            scene=os.path.basename(args.scene),
            shapes=len(scene.shapes), emitters=len(scene.emitters),
            sensors=[s.id for s in scene.sensors],
            triangles=int(ntris), integrator=scene.integrator.type))

    stats_all = []
    for si, sensor in enumerate(scene.sensors):
        spp = args.spp or sensor.samples
        if ui is not None:
            ui.set_sensor(sensor.id or f"sensor{si}")

        def progress(done, total):
            print(f"\r[wave_tracer_tpu] sensor {si} ({sensor.id}): "
                  f"{done}/{total} spp", end="", flush=True)
            if ui is not None:
                ui.progress(done, total)

        init_film, spp_start = None, 0
        ckpt_path = os.path.join(outdir,
                                 (sensor.id or f"sensor{si}") + ".ckpt.npz")
        if args.resume and os.path.isfile(ckpt_path):
            from wave_tracer_tpu.render.checkpoint import load_checkpoint
            init_film, spp_start, ck_seed, _sid = load_checkpoint(ckpt_path)
            if ck_seed != args.seed:
                print(f"[wave_tracer_tpu] checkpoint seed {ck_seed} != "
                      f"--seed {args.seed}; using checkpoint seed")
                args.seed = ck_seed
            spp_start = int(spp_start)
            print(f"[wave_tracer_tpu] resuming from {ckpt_path} "
                  f"({spp_start}/{spp} spp done)")

        if distributed:
            # global-mesh DP render (parallel/dist.py): every host runs
            # this same loop; films psum-merge on-device and outputs
            # are written by process 0 below
            from wave_tracer_tpu.parallel.dist import render_distributed
            from wave_tracer_tpu.parallel.launch import is_main_process
            img, stats = render_distributed(
                built, sensor_index=si, spp=spp, seed=args.seed,
                progress=progress)
            rend = None
            if not is_main_process():
                stats_all.append(stats)
                print()
                continue
        else:
            img, stats, rend = render_scene(
                built, sensor_index=si, spp=spp,
                batch_lanes=args.batch_lanes, seed=args.seed,
                progress=progress, interrupt=poll_interrupt,
                init_film=init_film, spp_start=spp_start,
                return_renderer=True)
        print()
        if stats.get("interrupted"):
            from wave_tracer_tpu.render.checkpoint import save_checkpoint
            save_checkpoint(ckpt_path, rend.last_film,
                            int(rend.last_spp_done), args.seed,
                            sensor.id or "")
            print(f"[wave_tracer_tpu] interrupted at "
                  f"{stats['spp_done']}/{spp} spp; checkpoint: "
                  f"{ckpt_path} (resume with --resume)")
        stats_all.append(stats)
        resp = sensor.response
        base = os.path.join(outdir, sensor.id or f"sensor{si}")
        meta = {"renderer": f"wave_tracer_tpu {__version__}",
                "scene": os.path.basename(args.scene),
                "sensor": sensor.id, "spp": str(spp)}

        polarimetric = getattr(sensor, "polarimetric", False)
        if polarimetric:
            # channels are (C response channels × 4 Stokes); write the
            # I/Q/U/V set like the reference (src/main.cpp:404-450)
            C = resp.channels
            st4 = img.reshape(img.shape[0], img.shape[1], C, 4)
            M = resp.develop_matrix()
            for ci, comp in enumerate("IQUV"):
                plane = st4[..., ci]
                if M is not None:
                    plane = plane @ M.T
                write_exr(f"{base}_{comp}.exr",
                          plane.astype(np.float32), metadata=meta)
            img = st4[..., 0]

        M = resp.develop_matrix()
        rgb = img @ M.T if M is not None else img
        write_exr(base + ".exr", rgb.astype(np.float32), metadata=meta)
        tm = resp.tonemap or Tonemap(type="sRGB")
        if tm.type in ("linear", "sRGB", "gamma") and rgb.shape[-1] == 3:
            scale = 1.0 / max(np.percentile(rgb, 99.9), 1e-30)
            png = srgb_encode(np.clip(rgb * scale, 0, 1))
        else:
            png = tm.apply(rgb)
        write_png(base + ".png", png)

        if args.mask:
            from wave_tracer_tpu.render.mask import render_mask
            alpha = render_mask(built, sensor)
            write_png(base + "_mask.png", alpha)
        if args.tev:
            try:
                from wave_tracer_tpu.util.tev import TevPreview
                pv = TevPreview(args.tev, sensor.id or f"sensor{si}",
                                rgb.shape[1], rgb.shape[0])
                pv.update(np.clip(
                    rgb / max(np.percentile(rgb, 99.9), 1e-30), 0, 1))
            except OSError as e:
                print(f"[wave_tracer_tpu] tev preview unavailable: {e}")
        if args.checkpoint:
            from wave_tracer_tpu.render.checkpoint import save_checkpoint
            from wave_tracer_tpu.sensor.film import make_film
            # persist the developed image + progress for resume tooling
            film = make_film(img.shape[1], img.shape[0], rgb.shape[-1])
            film = film.replace(value=jnp_asarray(rgb),
                                weight=jnp_ones(rgb.shape[:2]))
            save_checkpoint(base + ".ckpt.npz", film, spp, args.seed,
                            sensor.id)
        print(f"[wave_tracer_tpu] wrote {base}.exr / .png  "
              f"({stats['paths']} paths, "
              f"{stats['paths_per_sec']:.0f} paths/s)")
    signal.signal(signal.SIGINT, prev_handler)
    if args.write_stats:
        with open(os.path.join(outdir, "perf_stats.json"), "w") as f:
            json.dump(stats_all, f, indent=2)
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="wave_tracer_tpu",
        description="TPU-native wave-optical path tracer")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("version", help="print version")

    rp = sub.add_parser("render", help="render a scene XML")
    rp.add_argument("scene")
    rp.add_argument("-o", "--output", help="output directory")
    rp.add_argument("-D", "--define", action="append",
                    help="scene define name=value[,name=value...]")
    rp.add_argument("--spp", type=int, help="override samples per pixel")
    rp.add_argument("--mesh_scale", type=float, default=1.0)
    rp.add_argument("--batch_lanes", type=int, default=1 << 14)
    rp.add_argument("--seed", type=int, default=0)
    rp.add_argument("--write-stats", action="store_true")
    rp.add_argument("--mask", action="store_true",
                    help="also write sensor-visibility alpha masks")
    rp.add_argument("--tev", help="tev viewer host:port for live preview")
    rp.add_argument("--checkpoint", action="store_true",
                    help="write a resume checkpoint next to outputs")
    rp.add_argument("--resume", action="store_true",
                    help="resume from a sensor checkpoint in the output "
                         "dir (written on interrupt or --checkpoint)")
    rp.add_argument("--distributed", action="store_true",
                    help="multi-host render: init jax.distributed, "
                         "shard lanes over the global device mesh "
                         "(run the same command on every host)")
    rp.add_argument("--coordinator", default=None,
                    help="coordinator host:port (TPU pods auto-detect)")
    rp.add_argument("--num-processes", type=int, default=None)
    rp.add_argument("--process-id", type=int, default=None)
    rp.add_argument("--ray-tracing", action="store_true",
                    help="force classical ray tracing (disable wave "
                         "transport / FSD; reference main.cpp "
                         "--ray-tracing)")

    args = ap.parse_args(argv)
    if args.cmd == "version":
        print(f"wave_tracer_tpu {__version__}")
        return 0
    if args.cmd == "render":
        return cmd_render(args)
    return 1


if __name__ == "__main__":
    sys.exit(main())
