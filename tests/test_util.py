"""Utility subsystem tests: sobol sampler, stats, checkpoint, EXR IO."""

import os

import numpy as np
import jax.numpy as jnp

from wave_tracer_tpu.render import checkpoint
from wave_tracer_tpu.render.output import read_exr, write_exr
from wave_tracer_tpu.sampling import sobol
from wave_tracer_tpu.sensor.film import make_film
from wave_tracer_tpu.util import stats


class TestSobol:
    def test_uniform_coverage(self):
        idx = jnp.arange(1024)
        seed = jnp.zeros(1024, jnp.uint32)
        u = np.asarray(sobol.sample(idx, 0, seed))
        assert (u >= 0).all() and (u < 1).all()
        # stratification: 16 bins each get exactly 64 of 1024 (Sobol dim0
        # is van der Corput; Owen scrambling preserves stratification)
        hist, _ = np.histogram(u, bins=16, range=(0, 1))
        np.testing.assert_array_equal(hist, 64)

    def test_2d_low_discrepancy(self):
        n = 256
        idx = jnp.arange(n)
        seed = jnp.zeros(n, jnp.uint32)
        pts = np.asarray(sobol.sample2(idx, 0, seed))
        # per-quadrant balance beats iid random w.h.p.
        qx = (pts[:, 0] > 0.5).astype(int)
        qy = (pts[:, 1] > 0.5).astype(int)
        counts = np.bincount(qx * 2 + qy, minlength=4)
        np.testing.assert_allclose(counts, n / 4, atol=2)

    def test_seed_decorrelates(self):
        idx = jnp.arange(64)
        u0 = np.asarray(sobol.sample(idx, 0, jnp.zeros(64, jnp.uint32)))
        u1 = np.asarray(sobol.sample(idx, 0, jnp.full(64, 7, jnp.uint32)))
        assert np.abs(u0 - u1).max() > 0.1


class TestStats:
    def test_collectors(self):
        r = stats.Registry()
        r.counter("rays").add(10)
        r.counter("rays").add(5)
        r.histogram("depth").add(4)
        r.event_counter("casts").add("hit", 3)
        with r.timing("trace"):
            pass
        rep = r.report()
        assert rep["rays"] == 15
        assert sum(rep["depth"]) == 1
        assert rep["casts"]["hit"] == 3
        assert rep["trace"]["count"] == 1

    def test_running_stat(self):
        r = stats.RunningStat()
        for x in [1.0, 2.0, 3.0, 4.0]:
            r.add(x)
        rep = r.report()
        np.testing.assert_allclose(rep["mean"], 2.5)
        np.testing.assert_allclose(rep["std"], np.std([1, 2, 3, 4],
                                                      ddof=1))


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        film = make_film(8, 4, 3)
        film = film.replace(value=film.value + 2.5)
        p = str(tmp_path / "ckpt.npz")
        checkpoint.save_checkpoint(p, film, spp_done=7, seed=42,
                                   sensor_id="cam")
        f2, spp, seed, sid = checkpoint.load_checkpoint(p)
        assert spp == 7 and seed == 42 and sid == "cam"
        np.testing.assert_array_equal(np.asarray(f2.value),
                                      np.asarray(film.value))


class TestEXR:
    def test_roundtrip_half_zip(self, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 10, (33, 47, 3)).astype(np.float32)
        p = str(tmp_path / "t.exr")
        write_exr(p, img, half=True, compress=True,
                  metadata={"renderer": "wave_tracer_tpu"})
        out, names = read_exr(p)
        assert sorted(names) == ["B", "G", "R"]
        # channels stored alphabetically: B,G,R
        back = np.stack([out[..., names.index(c)] for c in "RGB"], axis=-1)
        np.testing.assert_allclose(back, img, rtol=2e-3, atol=2e-2)

    def test_roundtrip_float_uncompressed(self, tmp_path):
        img = np.linspace(0, 1, 16 * 16).reshape(16, 16).astype(np.float32)
        p = str(tmp_path / "t2.exr")
        write_exr(p, img, half=False, compress=False)
        out, names = read_exr(p)
        np.testing.assert_allclose(out[..., 0], img, atol=1e-7)


class TestDeviceCounters:
    def test_render_reports_counters(self):
        import jax
        from tests.test_render import make_box_scene
        from wave_tracer_tpu.render import render_scene
        from wave_tracer_tpu.scene import build_scene

        scene = make_box_scene(res=8, spp=2)
        scene.integrator.fsd = False
        built = build_scene(scene)
        img, st = render_scene(built, spp=2, batch_lanes=1 << 8)
        c = st["device_counters"]
        assert c["rays_cast"] > 0
        assert c["surface_interactions"] > 0
        # every surface interaction issues one NEE shadow ray (ray mode)
        assert c["shadow_rays"] == c["surface_interactions"]
        assert c["sum_path_depth"] <= c["rays_cast"]


class TestInterrupts:
    """The interrupt system (reference src/scene/render.cpp:328-368):
    terminate keeps completed work; resume from the saved film + spp
    cursor reproduces the uninterrupted render bit-exactly."""

    def test_terminate_and_resume_bit_exact(self):
        from tests.test_render import make_box_scene
        from wave_tracer_tpu.render import render_scene
        from wave_tracer_tpu.scene import build_scene

        scene = make_box_scene(res=8, spp=8)
        built = build_scene(scene)

        full, stats0 = render_scene(built, spp=8, batch_lanes=1 << 9,
                                    seed=3)
        assert not stats0["interrupted"]

        calls = {"n": 0}

        def interrupt():
            calls["n"] += 1
            return "terminate" if calls["n"] >= 2 else None

        part, stats1, rend = render_scene(
            built, spp=8, batch_lanes=1 << 9, seed=3,
            interrupt=interrupt, return_renderer=True)
        assert stats1["interrupted"]
        assert 0 < stats1["spp_done"] < 8

        resumed, stats2 = render_scene(
            built, spp=8, batch_lanes=1 << 9, seed=3,
            init_film=rend.last_film,
            spp_start=int(rend.last_spp_done))
        assert not stats2["interrupted"]
        np.testing.assert_allclose(resumed, full, rtol=1e-6, atol=1e-12)

    def test_capture_intermediate(self):
        from tests.test_render import make_box_scene
        from wave_tracer_tpu.render import render_scene
        from wave_tracer_tpu.scene import build_scene

        scene = make_box_scene(res=8, spp=4)
        built = build_scene(scene)
        captures = []

        def interrupt():
            return "capture"

        def on_capture(img, spp_done):
            captures.append((img.copy(), spp_done))

        img, stats = render_scene(built, spp=4, batch_lanes=1 << 9,
                                  seed=1, interrupt=interrupt,
                                  on_capture=on_capture)
        assert not stats["interrupted"]
        assert len(captures) >= 1
        assert np.isfinite(captures[0][0]).all()
