"""Scene XML dialect loader tests against the reference scene suite."""

import os

import numpy as np
import pytest

from wave_tracer_tpu.scene.xml import load_scene_xml
from wave_tracer_tpu.sensor.perspective import PerspectiveSensor
from wave_tracer_tpu.sensor.virtual_plane import VirtualPlaneSensor

SCENES = "/root/reference/scenes"

needs_scenes = pytest.mark.skipif(not os.path.isdir(SCENES),
                                  reason="reference scenes not mounted")


@needs_scenes
class TestReferenceScenes:
    def test_cornell_box(self):
        s = load_scene_xml(f"{SCENES}/cornell-box/box.xml",
                           {"res": "128", "spp": "4"})
        assert s.integrator.type == "plt_bdpt"
        assert s.integrator.max_depth == 16
        cam = s.sensors[0]
        assert isinstance(cam, PerspectiveSensor)
        assert cam.width == 128 and cam.samples == 4
        assert abs(np.degrees(cam.fov) - 19.75) < 1e-3
        # camera at (0, 1cm, 6.8cm) looking at -z
        np.testing.assert_allclose(cam.to_world[:3, 3],
                                   [0, 0.01, 0.068], atol=1e-9)
        np.testing.assert_allclose(cam.to_world[:3, 2], [0, 0, -1],
                                   atol=1e-9)
        # walls + prism + sphere + pipe + cube light (+ ply fallbacks ok)
        assert len(s.shapes) >= 9
        assert len(s.emitters) == 3   # two spots + area
        area = [e for e in s.emitters
                if type(e).__name__ == "AreaEmitter"]
        assert len(area) == 1
        # blackbody 7000K scaled
        assert abs(area[0].spectrum.T - 7000.0) < 1e-6

    def test_defaults_and_defines(self):
        s = load_scene_xml(f"{SCENES}/cornell-box/box.xml")
        assert s.sensors[0].width == 1280   # <default name="res" value="1280">
        s2 = load_scene_xml(f"{SCENES}/cornell-box/box.xml", {"res": "256"})
        assert s2.sensors[0].width == 256

    def test_double_slits_pattern(self):
        s = load_scene_xml(f"{SCENES}/diffraction_simple/double_slits.xml",
                           {"pattern": "true"})
        vs = s.sensors[0]
        assert isinstance(vs, VirtualPlaneSensor)
        assert vs.width == 1024 and vs.height == 256   # res, res/4
        np.testing.assert_allclose(vs.extent, [0.25, 0.0625], atol=1e-9)
        r = vs.response
        assert r.type == "monochromatic"
        assert r.spectrum.is_discrete
        # lambda = .05mm → k = 2π/5e-5
        k = r.spectrum.lines()[0][0]
        np.testing.assert_allclose(k, 2 * np.pi / 5e-5, rtol=1e-6)
        assert r.tonemap.type == "dB"
        assert r.tonemap.db_min == -18 and r.tonemap.db_max == 25
        # geometry included via <include path="bits/geometry.xml">
        assert len(s.shapes) >= 4

    def test_double_slits_disabled_sensor_switch(self):
        s = load_scene_xml(f"{SCENES}/diffraction_simple/double_slits.xml",
                           {"pattern": "false"})
        assert isinstance(s.sensors[0], PerspectiveSensor)

    def test_etoile_radio(self):
        s = load_scene_xml(f"{SCENES}/sionna_etoile/etoile.xml",
                           {"wavelength": "10GHz"})
        # ITU materials resolve; discrete 10GHz spectrum default
        vs = s.sensors[0]
        assert isinstance(vs, VirtualPlaneSensor)
        em = s.emitters[0]
        k = em.spectrum.lines()[0][0]
        lam = 2 * np.pi / k
        np.testing.assert_allclose(lam, 299792458.0 / 10e9, rtol=1e-5)

    def test_all_scenes_load(self):
        paths = [
            "cornell-box/box.xml", "veach_mis/mis.xml",
            "diffraction_simple/double_slits.xml",
            "diffraction_simple/double_slits_and_reflectors.xml",
            "sionna_etoile/etoile.xml", "sionna_munich/munich.xml",
            "bidir_room/room.xml", "bike/bike.xml", "kitchen/kitchen.xml",
            "objects/objects.xml", "colourchecker/colourchecker.xml",
        ]
        for p in paths:
            s = load_scene_xml(os.path.join(SCENES, p))
            assert s.sensors, p
