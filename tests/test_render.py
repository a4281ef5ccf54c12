"""End-to-end render tests on a small procedurally-built box scene."""

import math

import numpy as np
import pytest

from wave_tracer_tpu.bsdf import DiffuseBSDF, Material
from wave_tracer_tpu.core.transform import Transform
from wave_tracer_tpu.emitter.model import AreaEmitter, PointEmitter
from wave_tracer_tpu.geometry import mesh
from wave_tracer_tpu.render import render_scene
from wave_tracer_tpu.scene import IntegratorConfig, Scene, Shape, build_scene
from wave_tracer_tpu.sensor.perspective import PerspectiveSensor, \
    lookat_matrix
from wave_tracer_tpu.sensor.response import Response
from wave_tracer_tpu.spectrum.spectra import (BlackbodySpectrum,
                                              RGBSpectrum, UniformSpectrum)
from wave_tracer_tpu.texture.texture import ConstantSpectrumTexture


def make_box_scene(res=32, spp=8, emitter="area"):
    """A 2m box open at +z with a light at the top."""
    white = Material(bsdf=DiffuseBSDF(
        reflectance=ConstantSpectrumTexture(UniformSpectrum(0.7, 1.0, 1e9))),
        name="white")
    red = Material(bsdf=DiffuseBSDF(
        reflectance=ConstantSpectrumTexture(RGBSpectrum((0.8, 0.1, 0.1)))),
        name="red")
    green = Material(bsdf=DiffuseBSDF(
        reflectance=ConstantSpectrumTexture(RGBSpectrum((0.1, 0.8, 0.1)))),
        name="green")

    L = 2.0
    shapes = [
        # floor (normal +y)
        Shape(mesh.rectangle(L, Transform.from_rows(
            [1, 0, 0, 0, 0, 0, 1, 0, 0, -1, 0, 0, 0, 0, 0, 1])), white),
        # ceiling (normal -y)
        Shape(mesh.rectangle(L, Transform.from_rows(
            [1, 0, 0, 0, 0, 0, -1, L, 0, 1, 0, 0, 0, 0, 0, 1])), white),
        # back wall at z=-1 (normal +z)
        Shape(mesh.rectangle(L, Transform.from_rows(
            [1, 0, 0, 0, 0, 1, 0, 1, 0, 0, 1, -1, 0, 0, 0, 1])), white),
        # left wall x=-1 (normal +x)
        Shape(mesh.rectangle(L, Transform.from_rows(
            [0, 0, 1, -1, 0, 1, 0, 1, -1, 0, 0, 0, 0, 0, 0, 1])), red),
        # right wall x=+1 (normal -x)
        Shape(mesh.rectangle(L, Transform.from_rows(
            [0, 0, -1, 1, 0, 1, 0, 1, 1, 0, 0, 0, 0, 0, 0, 1])), green),
    ]
    emitters = []
    if emitter == "area":
        lamp_spec = BlackbodySpectrum(T=5000.0, scale=5e-13)
        lamp = AreaEmitter(spectrum=lamp_spec)
        # small panel slightly under the ceiling, facing down
        panel = mesh.rectangle(0.5, Transform.from_rows(
            [1, 0, 0, 0, 0, 0, -1, L - 0.01, 0, 1, 0, 0, 0, 0, 0, 1]))
        shapes.append(Shape(panel, Material(
            bsdf=DiffuseBSDF(reflectance=ConstantSpectrumTexture(
                UniformSpectrum(0.1, 1.0, 1e9)))), emitter=lamp))
        emitters.append(lamp)
    else:
        lamp_spec = BlackbodySpectrum(T=5000.0, scale=5e-13)
        emitters.append(PointEmitter(spectrum=lamp_spec,
                                     position=np.array([0.0, 1.8, 0.0])))

    sensor = PerspectiveSensor(
        width=res, height=res, fov=math.radians(60.0),
        to_world=lookat_matrix([0, 1.0, 3.2], [0, 1.0, 0]),
        samples=spp, response=Response(type="RGB", colourspace="sRGB",
                                       white_point="D65"))
    return Scene(shapes=shapes, emitters=emitters, sensors=[sensor],
                 integrator=IntegratorConfig(max_depth=5))


@pytest.fixture(scope="module")
def box_render():
    scene = make_box_scene(res=32, spp=8)
    built = build_scene(scene)
    img, stats = render_scene(built, spp=8, batch_lanes=1 << 13)
    return scene, img, stats


class TestRender:
    def test_image_finite_positive(self, box_render):
        scene, img, stats = box_render
        assert img.shape == (32, 32, 3)
        assert np.isfinite(img).all()
        assert img.max() > 0

    def test_walls_are_coloured(self, box_render):
        scene, img, stats = box_render
        # develop XYZ->RGB
        M = scene.sensors[0].response.develop_matrix()
        rgb = img @ M.T
        # reference lookat convention (l = up × d) puts world +x on the
        # image LEFT: green wall (x=+1) left, red wall (x=-1) right
        left = rgb[8:24, 2:8].mean(axis=(0, 1))
        right = rgb[8:24, 24:30].mean(axis=(0, 1))
        assert left[1] > left[0] * 1.2, f"left {left}"
        assert right[0] > right[1] * 1.2, f"right {right}"

    def test_upper_area_brighter_near_lamp(self, box_render):
        scene, img, stats = box_render
        lum = img[..., 1]
        top = lum[2:10].mean()
        bottom = lum[22:30].mean()
        assert top > bottom * 0.8  # lamp is up: ceiling vicinity lit

    def test_point_emitter_scene_renders(self):
        scene = make_box_scene(res=16, spp=4, emitter="point")
        built = build_scene(scene)
        img, _ = render_scene(built, spp=4, batch_lanes=1 << 11)
        assert np.isfinite(img).all() and img.max() > 0
