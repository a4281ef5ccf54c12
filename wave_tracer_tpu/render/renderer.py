"""Render orchestration: batched wavefront launches into a film.

The reference's scene_renderer_t drives a thread pool over 24×24 pixel
blocks (reference include/wt/sensor/../scene_renderer.hpp:102,
src/scene/render.cpp:381-579). On TPU the equivalent is a jitted
mega-batch: (pixels × spp) lanes are chunked into launches sized to fill
the chip, each launch traces a full wavefront and scatter-adds into the
film carried as device state. Backward (camera) sensors use the wave
plt_path integrator when free-space diffraction is enabled; virtual-plane
coverage sensors render with forward light tracing into the direct-splat
film (reference plt_path integrate_forward).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from wave_tracer_tpu.integrator.path import trace_paths
from wave_tracer_tpu.integrator.plt_bdpt import trace_bdpt
from wave_tracer_tpu.integrator.plt_path import trace_paths_wave
from wave_tracer_tpu.integrator.plt_path_forward import trace_forward
from wave_tracer_tpu.sampling import rng
from wave_tracer_tpu.sensor import film as film_mod
from wave_tracer_tpu.sensor.virtual_plane import VirtualPlaneSensor

# beyond this edge count the clustered two-level edge query kicks in
# inside the integrators; this ceiling only guards truly huge scenes
MAX_FSD_EDGES = 1 << 20


@dataclasses.dataclass
class Renderer:
    built: object                  # BuiltScene
    batch_lanes: int = 1 << 17     # lanes per launch
    seed: int = 0
    # True: sweep all pixel batches in one dispatch (device fori_loop) —
    # best when per-launch latency is high. False: one dispatch per batch
    # with pre-staged scalars — the axon TPU backend currently compiles
    # the unfused kernel far more reliably.
    fuse_batches: bool = True
    # interrupt system (reference src/scene/render.cpp:328-368): a
    # callable polled between dispatches returning None | "terminate" |
    # "capture". "terminate" stops after the current chunk and develops
    # the completed work; "capture" develops mid-render and passes the
    # intermediate image to on_capture (capture_intermediate analogue).
    # Pausing = blocking inside the callable.
    interrupt: object = None
    on_capture: object = None
    # populated after render_sensor: the raw film + progress, for
    # checkpoint/resume of interrupted renders
    last_film: object = None
    last_spp_done: int = 0
    # persistent-wavefront lane compaction for the classical kernel
    # (integrator/path_compact.py): dead lanes refill instead of riding
    # the depth loop — ~1.5-2x throughput at depth 8 with RR
    compact: bool = True
    # device-side perf counters carried through the hot loop. The
    # reference compile-time-gates its equivalents OFF outside Profile
    # builds (_additional_ads_stats, CMakeLists:393-396); here they are
    # a runtime toggle (default on — the test suite asserts on them;
    # benchmarks turn them off to mirror the reference's default build)
    device_stats: bool = True

    def render_sensor(self, sensor_index: int = 0, spp: int | None = None,
                      progress=None, init_film=None, spp_start: int = 0):
        built = self.built
        scene = built.scene
        sensor = scene.sensors[sensor_index]
        spp = spp or sensor.samples
        data = built.data.replace(
            spectral=built.spectral_per_sensor[sensor_index])
        if isinstance(sensor, VirtualPlaneSensor):
            return self._render_forward(data, sensor, spp, progress,
                                        init_film, spp_start)
        return self._render_backward(data, sensor, spp, progress,
                                     init_film, spp_start)

    def _poll_interrupt(self, film, spp_done, direct_norm):
        """Returns True when the render should stop. direct_norm is the
        per-element normalization of the light image at capture time
        (0 = no direct image in this mode)."""
        if self.interrupt is None:
            return False
        action = self.interrupt()
        if action == "capture" and self.on_capture is not None:
            img = np.asarray(film_mod.develop(film, direct_norm))
            self.on_capture(img, spp_done)
            return False
        return action == "terminate"

    # ------------------------------------------------------------------
    def _render_backward(self, data, sensor, spp, progress,
                         init_film=None, spp_start: int = 0):
        built = self.built
        scene = built.scene
        W, H = sensor.width, sensor.height
        C = sensor.response.channels \
            * (4 if getattr(sensor, "polarimetric", False) else 1)
        film = init_film if init_film is not None \
            else film_mod.make_film(W, H, C, sensor.rfilter_sigma)
        base_key = rng.make_base_key(self.seed)
        cfg = scene.integrator
        eps = 1e-4 * scene.world_radius()
        n_edges = int(data.edges.count)
        fsd_on = (cfg.fsd and not sensor.ray_trace_only
                  and not cfg.ray_trace_only
                  and 0 < n_edges <= MAX_FSD_EDGES)
        bdpt = (cfg.type == "plt_bdpt"
                and not sensor.ray_trace_only and not cfg.ray_trace_only)
        wave = fsd_on and not bdpt

        # bdpt keeps the batched driver BY DESIGN: a bdpt lane is two
        # fixed-capacity subpath walks plus an O(S·T) connection matrix
        # over the stored vertex arrays — there is no per-bounce "lane
        # died, refill" point the persistent-compaction pool exploits
        # (the walks already run to their vertex caps, and the
        # connection phase consumes both walks at once). Measured
        # r5: the dominant cost is the connection phase, which is
        # identical under either driver; bench.py carries
        # bdpt_paths_per_sec for the batched driver.
        if self.compact and not bdpt:
            return self._render_backward_compact(
                data, sensor, spp, progress, film, base_key, cfg, eps,
                spp_start, wave=wave, fsd=fsd_on)

        npixels = W * H
        lanes = self.batch_lanes
        pix_per_batch = min(max(lanes // max(spp, 1), 1), npixels)
        spp_per_batch = min(max(lanes // pix_per_batch, 1), spp)
        if self.interrupt is not None:
            # interrupt-responsive chunking: ≥~8 poll points per render
            spp_per_batch = min(spp_per_batch, max(1, -(-spp // 8)))
            pix_per_batch = min(max(lanes // spp_per_batch, 1), npixels)

        kern = make_render_kernel(sensor, cfg.max_depth, eps, cfg.mis,
                                  wave, bdpt, bdpt_fsd=fsd_on)

        n_pix_batches = -(-npixels // pix_per_batch)
        npix_dev = jnp.asarray(npixels)
        t0 = time.time()
        total_lanes = 0
        # collect per-dispatch counter vectors and reduce ONCE at the end:
        # a per-call `+` serializes against the render dispatch chain and
        # costs ~13% throughput on this backend
        kst_list = []
        spp_done = spp_start
        for s0 in range(spp_start, spp, spp_per_batch):
            s1 = min(s0 + spp_per_batch, spp)
            s0_dev = jnp.asarray(s0)
            sc_dev = jnp.asarray(s1 - s0)
            if self.fuse_batches:
                # one dispatch sweeps every pixel batch on-device
                film, kst = kern(data, film, base_key, npix_dev,
                                 n_pix_batches, pix_per_batch, s0_dev,
                                 sc_dev, s1 - s0)
                kst_list.append(kst)
            else:
                stop = False
                film_chunk0 = None
                if self.interrupt is not None:
                    # snapshot so a mid-sweep terminate can roll back to
                    # the chunk boundary (resume would otherwise double-
                    # splat the completed pixel batches)
                    film_chunk0 = film.replace(
                        value=film.value + 0, weight=film.weight + 0,
                        direct=film.direct + 0)
                for bi in range(n_pix_batches):
                    film, kst = kern(data, film, base_key, npix_dev, 1,
                                     pix_per_batch, s0_dev, sc_dev,
                                     s1 - s0, b0=jnp.asarray(bi))
                    kst_list.append(kst)
                    # unfused mode polls between pixel-batch dispatches
                    # too (finer interrupt granularity); a partial pixel
                    # sweep still develops correctly through the film's
                    # per-texel weights
                    if self._poll_interrupt(film, s0,
                                            s0 if bdpt else 0.0):
                        stop = True
                        break
                if stop:
                    film = film_chunk0
                    break
            total_lanes += npixels * (s1 - s0)
            spp_done = s1
            if progress:
                progress(s1, spp)
            if self._poll_interrupt(film, spp_done,
                                    spp_done if bdpt else 0.0):
                break
        film.value.block_until_ready()
        self.last_film = film
        self.last_spp_done = spp_done
        dev_stats = jnp.sum(jnp.stack(kst_list), axis=0) \
            if kst_list else None
        dt = time.time() - t0
        # bdpt light-tracing splats live in the direct image, normalized
        # per-pixel-sample like the reference's light image
        img = np.asarray(film_mod.develop(film,
                                          spp_done if bdpt else 0.0))
        mode = "bdpt" if bdpt else ("wave" if wave else "ray")
        out = dict(seconds=dt, paths=total_lanes,
                   paths_per_sec=total_lanes / max(dt, 1e-9), mode=mode,
                   spp_done=spp_done, interrupted=spp_done < spp)
        if dev_stats is not None and self.device_stats:
            out["device_counters"] = _record_device_stats(
                np.asarray(dev_stats))
        return img, out

    # ------------------------------------------------------------------
    def _render_backward_compact(self, data, sensor, spp, progress, film,
                                 base_key, cfg, eps, spp_start: int = 0,
                                 wave: bool = False, fsd: bool = True):
        """Classical/wave backward render through the persistent
        compacted wavefront.

        Two drivers (integrator/path_compact.py): a single-dispatch
        device while_loop, or a host-stepped loop (one jitted bounce per
        dispatch, state donated). The axon TPU backend wedges compiling
        the wave bounce inside a persistent while_loop AND runs in-loop
        code 3-4x slower (CLAUDE.md perf model), so non-CPU platforms
        default to the stepped driver; override with
        WT_COMPACT_MODE=while|stepped."""
        import os
        from wave_tracer_tpu.integrator.path_compact import (
            make_compact_kernel, make_stepped_kernel)
        W, H = sensor.width, sensor.height
        npixels = W * H
        mode = os.environ.get("WT_COMPACT_MODE", "")
        if mode not in ("while", "stepped"):
            is_cpu = jax.devices()[0].platform.lower() == "cpu"
            # measured on the axon v5e (cornell box, 16k lanes): the
            # classical bounce is cheap (~35 ms/step) so the host-step
            # overhead costs 1.7x and the device while_loop wins (96k vs
            # 57k paths/s); the wave bounce is ~10x heavier and the
            # while_loop both wedges the axon compiler AND pays the
            # 3-4x in-loop scheduling penalty — stepped wins (9.9k vs
            # 6.4k beams/s batched; the while variant doesn't compile)
            mode = "stepped" if (wave and not is_cpu) else "while"
        # pool size sweet spots measured per driver (r5 sweep): the
        # classical while_loop peaks at 8k lanes (97.4k vs 95.7k at
        # 16k vs 91.7k at 32k); the stepped wave driver amortises its
        # per-dispatch cost best at 16k
        default_lanes = (1 << 13) if mode == "while" else (1 << 14)
        lanes = min(self.batch_lanes,
                    int(os.environ.get("WT_COMPACT_LANES",
                                       default_lanes)))
        key = ("compact", mode, id(sensor), cfg.max_depth, float(eps),
               bool(cfg.mis), bool(wave), bool(fsd),
               bool(self.device_stats),
               bool(getattr(sensor, "polarimetric", False)))
        if key in _kernel_cache:
            kern = _kernel_cache[key][1]
        else:
            if mode == "stepped":
                kern = make_stepped_kernel(sensor, cfg.max_depth, eps,
                                           cfg.mis, wave=wave, fsd=fsd,
                                           with_stats=self.device_stats)
            else:
                kern = make_compact_kernel(sensor, cfg.max_depth, eps,
                                           cfg.mis, wave=wave, fsd=fsd,
                                           with_stats=self.device_stats)
            _kernel_cache[key] = (sensor, kern)

        # chunk by spp for interrupt/progress granularity
        spp_chunk = max(1, -(-spp // 8)) if self.interrupt else spp
        t0 = time.time()
        total_lanes = 0
        spp_done = spp_start
        kst_list = []
        for s0 in range(spp_start, spp, spp_chunk):
            s1 = min(s0 + spp_chunk, spp)
            bounds = jnp.asarray([s0 * npixels, s1 * npixels], jnp.int32)
            if mode == "stepped":
                init, step, finish = kern
                c = init(data, film, base_key, bounds, lanes)
                while True:
                    c = step(data, c)
                    # host poll of the device-side liveness flag; ~0.2 ms
                    # against a multi-hundred-ms bounce
                    if not bool(c["alive"]):
                        break
                film, kst = finish(c)
            else:
                film, kst = kern(data, film, base_key, bounds, lanes)
            kst_list.append(kst)
            total_lanes += (s1 - s0) * npixels
            spp_done = s1
            if progress:
                progress(s1, spp)
            if self._poll_interrupt(film, spp_done, 0.0):
                break
        film.value.block_until_ready()
        self.last_film = film
        self.last_spp_done = spp_done
        dt = time.time() - t0
        img = np.asarray(film_mod.develop(film, 0.0))
        out = dict(seconds=dt, paths=total_lanes,
                   paths_per_sec=total_lanes / max(dt, 1e-9),
                   mode="wave-compact" if wave else "ray-compact",
                   spp_done=spp_done,
                   interrupted=spp_done < spp)
        dev_stats = jnp.sum(jnp.stack(kst_list), axis=0) \
            if kst_list else None
        if dev_stats is not None and self.device_stats:
            out["device_counters"] = _record_device_stats(
                np.asarray(dev_stats))
        return img, out

    # ------------------------------------------------------------------
    def _render_forward(self, data, sensor, spp, progress,
                        init_film=None, spp_start: int = 0):
        built = self.built
        scene = built.scene
        W, H = sensor.width, sensor.height
        C = sensor.response.channels \
            * (4 if getattr(sensor, "polarimetric", False) else 1)
        film = init_film if init_film is not None \
            else film_mod.make_film(W, H, C, sensor.rfilter_sigma)
        base_key = rng.make_base_key(self.seed)
        cfg = scene.integrator
        eps = 1e-4 * scene.world_radius()
        wave = cfg.fsd and 0 < int(data.edges.count) <= MAX_FSD_EDGES

        total_paths = spp * W * H
        lanes = self.batch_lanes
        fsd_mode = "fraunhofer" if cfg.type == "plt_bdpt" else "utd"
        kern = make_forward_kernel(sensor, cfg.max_depth, eps, wave,
                                   fsd_mode)

        t0 = time.time()
        done = spp_start * W * H
        batch = -(-done // lanes)
        while done < total_paths:
            n = min(lanes, total_paths - done)
            lane_ids = jnp.arange(lanes, dtype=jnp.int32)
            sids = jnp.full((lanes,), batch, jnp.int32)
            live = jnp.arange(lanes, dtype=jnp.int32) < n
            film = kern(data, film, base_key, lane_ids, sids, live)
            done += n
            batch += 1
            if progress:
                progress(done, total_paths)
            spe_now = done / float(W * H)
            if self._poll_interrupt(film, spe_now, spe_now):
                break
        film.direct.block_until_ready()
        self.last_film = film
        self.last_spp_done = done / float(W * H)
        dt = time.time() - t0
        spe = done / float(W * H)
        img = np.asarray(film_mod.develop(film, spe))
        return img, dict(seconds=dt, paths=done,
                         paths_per_sec=done / max(dt, 1e-9),
                         mode="forward-wave" if wave else "forward",
                         spp_done=spe, interrupted=done < total_paths)


def _record_device_stats(vec):
    """Record the device-counter vector into the host stats registry
    (reference stat_collector_registry.hpp:40-76 behaviour) and return it
    as a dict."""
    from wave_tracer_tpu.integrator.path import (
        N_TRI_HIST, STAT_BALLISTIC, STAT_CONE_TESTS, STAT_DEPTH_SUM,
        STAT_DIFFUSIVE, STAT_EDGE_HIT, STAT_FSD, STAT_NULL, STAT_RAYS,
        STAT_RR_KILL, STAT_SHADOW, STAT_SURFACE, STAT_TRI_HIST0,
        STAT_TRI_TESTS)
    from wave_tracer_tpu.util import stats as stats_mod
    names = {
        "rays_cast": STAT_RAYS, "shadow_rays": STAT_SHADOW,
        "surface_interactions": STAT_SURFACE,
        "fsd_interactions": STAT_FSD, "null_interactions": STAT_NULL,
        "rr_terminations": STAT_RR_KILL,
        "sum_path_depth": STAT_DEPTH_SUM,
        "edge_sweep_hits": STAT_EDGE_HIT,
        "ballistic_traversals": STAT_BALLISTIC,
        "diffusive_traversals": STAT_DIFFUSIVE,
        # ads_stats.hpp:63 analogues for the all-pairs backends
        "ray_tri_tests": STAT_TRI_TESTS,
        "cone_tri_tests": STAT_CONE_TESTS,
    }
    out = {}
    reg = stats_mod.registry
    for name, idx in names.items():
        v = float(vec[idx])
        out[name] = v
        reg.counter(f"integrator/{name}").add(v)
    # tris-per-cone log2 histogram (reference ads_stats.hpp:78-86)
    hist = [float(vec[STAT_TRI_HIST0 + i]) for i in range(N_TRI_HIST)]
    if any(hist):
        out["tris_per_cone_hist"] = hist
        h = reg.histogram("ads/tris_per_cone")
        for i, c in enumerate(hist):
            h.add_count(i, c)
    return out


# compiled-kernel cache: make_render_kernel returns a fresh @jax.jit
# closure, so without caching EVERY render_scene call would recompile
# (~30 s on the axon backend — this was silently eating 3x of the bench
# throughput: the "timed second pass" recompiled too)
_kernel_cache = {}


def make_render_kernel(sensor, max_depth, eps, mis, wave, bdpt=False,
                       bdpt_fsd=False):
    """Jitted backward launch: sweep all pixel batches for one spp chunk
    inside a single dispatch (device-side fori_loop over batches).
    Cached per (sensor, config) so repeated renders reuse the compiled
    executable."""
    key = ("bwd", id(sensor), max_depth, float(eps), bool(mis),
           bool(wave), bool(bdpt), bool(bdpt_fsd),
           bool(getattr(sensor, "polarimetric", False)))
    if key in _kernel_cache:
        return _kernel_cache[key][1]
    kern = _make_render_kernel(sensor, max_depth, eps, mis, wave, bdpt,
                               bdpt_fsd)
    # the sensor reference is kept alive so its id() cannot be recycled
    _kernel_cache[key] = (sensor, kern)
    return kern


def _make_render_kernel(sensor, max_depth, eps, mis, wave, bdpt,
                        bdpt_fsd):

    @partial(jax.jit, static_argnums=(4, 5, 8), donate_argnums=(1,))
    def kern(data, film, base_key, npix, n_batches, pix_cap, s0, s_count,
             spp_cap, b0=None):
        W = sensor.width

        def one_batch(bi, carry):
            film, kstats = carry
            if b0 is not None:
                bi = bi + b0
            p0 = bi * pix_cap
            pix = p0 + jnp.arange(pix_cap, dtype=jnp.int32)
            live_p = pix < npix
            pix = jnp.where(live_p, pix, 0)
            px = pix % W
            py = pix // W
            sids = s0 + jnp.arange(spp_cap, dtype=jnp.int32)
            live_s = jnp.arange(spp_cap, dtype=jnp.int32) < s_count

            pxy = jnp.stack(jnp.broadcast_arrays(px[:, None],
                                                 py[:, None]), axis=-1)
            pxy = jnp.broadcast_to(pxy,
                                   (pix_cap, spp_cap, 2)).reshape(-1, 2)
            sid = jnp.broadcast_to(sids[None, :],
                                   (pix_cap, spp_cap)).reshape(-1)
            live = jnp.broadcast_to(live_p[:, None] & live_s[None, :],
                                    (pix_cap, spp_cap)).reshape(-1)

            jit_u = rng.uniform(rng.sample_key(base_key,
                                               pxy[:, 1] * W + pxy[:, 0],
                                               sid),
                                rng.D_PIXEL_JITTER, 2)
            if bdpt:
                pos, values, ok, (lt_pos, lt_val, lt_ok), dstats = \
                    trace_bdpt(
                        data, pxy, jit_u, base_key, sid, sensor=sensor,
                        max_depth=min(max_depth, 16), eps=eps,
                        fsd=bdpt_fsd, with_stats=True)
                kstats = kstats + dstats
                # light-tracing splats are flattened per stored light
                # vertex: V splats per lane
                V = lt_ok.shape[0] // live.shape[0]
                lt_live = jnp.repeat(live, V) if V > 1 else live
                film = film_mod.splat_direct(film, lt_pos, lt_val,
                                             lt_ok & lt_live)
            elif wave:
                pos, values, ok, dstats = trace_paths_wave(
                    data, pxy, jit_u, base_key, sid, sensor=sensor,
                    edge_table=data.edges, max_depth=max_depth, eps=eps,
                    mis=mis, with_stats=True)
                kstats = kstats + dstats
            else:
                pos, values, ok, dstats = trace_paths(
                    data, pxy, jit_u, base_key, sid, sensor=sensor,
                    max_depth=max_depth, eps=eps, mis=mis,
                    with_stats=True)
                kstats = kstats + dstats
            return film_mod.splat(film, pos, values, ok & live), kstats

        from wave_tracer_tpu.integrator.path import N_STATS
        return jax.lax.fori_loop(
            0, n_batches, one_batch,
            (film, jnp.zeros((N_STATS,), jnp.float32)))

    return kern


def make_forward_kernel(sensor, max_depth, eps, wave, fsd_mode="utd"):
    """Jitted forward launch: emit lanes, record plane crossings.
    Cached like make_render_kernel."""
    key = ("fwd", id(sensor), max_depth, float(eps), bool(wave), fsd_mode,
           bool(getattr(sensor, "polarimetric", False)))
    if key in _kernel_cache:
        return _kernel_cache[key][1]
    kern = _make_forward_kernel(sensor, max_depth, eps, wave, fsd_mode)
    _kernel_cache[key] = (sensor, kern)
    return kern


def _make_forward_kernel(sensor, max_depth, eps, wave, fsd_mode):

    @jax.jit
    def kern(data, film, base_key, lane_ids, sids, live):
        pos, values, ok, sig, nee = trace_forward(
            data, lane_ids, base_key, sids, sensor=sensor,
            edge_table=data.edges, max_depth=max_depth, eps=eps,
            fsd=wave, fsd_mode=fsd_mode)
        film = film_mod.splat_direct_gaussian(film, pos, sig, values,
                                              ok & live)
        # FSD-NEE connections: one per (lane, depth), point splats
        nee_pos, nee_val, nee_ok = nee
        rep = nee_ok.shape[0] // live.shape[0]
        nee_live = jnp.repeat(live, rep) if rep > 1 else live
        return film_mod.splat_direct(film, nee_pos, nee_val,
                                     nee_ok & nee_live)

    return kern


def render_scene(built, sensor_index: int = 0, spp: int | None = None,
                 batch_lanes: int = 1 << 17, seed: int = 0,
                 progress=None, fuse_batches: bool = True,
                 interrupt=None, on_capture=None, init_film=None,
                 spp_start: int = 0, return_renderer: bool = False,
                 device_stats: bool = True):
    r = Renderer(built, batch_lanes=batch_lanes, seed=seed,
                 fuse_batches=fuse_batches, interrupt=interrupt,
                 on_capture=on_capture, device_stats=device_stats)
    out = r.render_sensor(sensor_index, spp, progress,
                          init_film=init_film, spp_start=spp_start)
    if return_renderer:
        return out + (r,)
    return out
