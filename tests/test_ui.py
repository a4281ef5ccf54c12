"""Headless tests for the live render frontend (util/ui.py — the
reference renderui/GUI analogue, src/util/gui/gui.cpp) driven over
plain HTTP, plus an end-to-end render controlled through it."""

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from wave_tracer_tpu.util.ui import RenderUI


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=5) as r:
        return r.status, r.read()


def _post(port, path):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", method="POST", data=b"")
    with urllib.request.urlopen(req, timeout=5) as r:
        return r.status


class TestRenderUI:
    def test_status_page_and_controls(self):
        ui = RenderUI()
        port = ui.serve(0)
        try:
            code, body = _get(port, "/")
            assert code == 200 and b"wave_tracer_tpu" in body
            ui.set_scene_info({"triangles": 42})
            ui.progress(3, 16, paths_per_sec=1234.0)
            code, body = _get(port, "/status")
            s = json.loads(body)
            assert s["spp_done"] == 3 and s["spp"] == 16
            assert s["scene"]["triangles"] == 42
            assert s["state"] == "running"

            # pause blocks the interrupt callable; resume releases it
            assert _post(port, "/pause") == 200
            released = []

            def poll():
                released.append(ui.interrupt())

            t = threading.Thread(target=poll)
            t.start()
            time.sleep(0.15)
            assert t.is_alive(), "interrupt() must block while paused"
            assert _post(port, "/resume") == 200
            t.join(timeout=5)
            assert not t.is_alive() and released == [None]

            # capture request surfaces exactly once
            assert _post(port, "/capture") == 200
            assert ui.interrupt() == "capture"
            assert ui.interrupt() is None

            # terminate wins over everything
            assert _post(port, "/terminate") == 200
            assert ui.interrupt() == "terminate"
            with pytest.raises(urllib.error.HTTPError):
                _post(port, "/nonsense")     # unknown action → 400
        finally:
            ui.shutdown()

    def test_preview_capture_roundtrip(self):
        ui = RenderUI()
        port = ui.serve(0)
        try:
            code, _ = _get(port, "/status")
            assert code == 200
            with pytest.raises(Exception):
                _get(port, "/preview.png")   # 404 before any capture
            img = np.random.default_rng(0).random((8, 8, 3)).astype(
                np.float32)
            ui.on_capture(img, 4)
            code, body = _get(port, "/preview.png")
            assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
        finally:
            ui.shutdown()

    def test_render_end_to_end_through_ui(self):
        """A real (tiny) render driven through the UI's interrupt/capture
        hooks: capture mid-render produces a preview; the render
        completes and the progress reaches spp."""
        from tests.test_render import make_box_scene
        from wave_tracer_tpu.render import render_scene
        from wave_tracer_tpu.scene import build_scene

        ui = RenderUI()
        port = ui.serve(0)
        try:
            scene = make_box_scene(res=16, spp=4)
            built = build_scene(scene)
            ui.progress(0, 4)
            _post(port, "/capture")

            img, stats = render_scene(
                built, spp=4, batch_lanes=1 << 10,
                interrupt=ui.interrupt, on_capture=ui.on_capture)
            ui.progress(stats["spp_done"], 4)
            assert not stats["interrupted"]
            code, body = _get(port, "/preview.png")
            assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
            _, sb = _get(port, "/status")
            assert json.loads(sb)["spp_done"] == 4
        finally:
            ui.shutdown()
