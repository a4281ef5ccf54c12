"""Tests for procedural meshes and mesh IO."""

import math

import numpy as np

from wave_tracer_tpu.core.transform import Transform
from wave_tracer_tpu.geometry import mesh, obj, ply


class TestProcedural:
    def test_rectangle(self):
        m = mesh.rectangle(2.0)
        assert m.num_tris == 2
        assert m.areas().sum() == np.testing.assert_allclose(
            m.areas().sum(), 4.0) or True
        np.testing.assert_allclose(m.geo_n, [[0, 0, 1]] * 2)
        # bounds
        assert m.positions.min() == -1.0 and m.positions.max() == 1.0

    def test_rectangle_transform(self):
        t = Transform.from_rows([0, 1, 0, 0, 0, 0, 2, 0, 1, 0, 0, 0,
                                 0, 0, 0, 1])
        m = mesh.rectangle(2.0, to_world=t)
        # local z maps to world y (scaled 2): normal must be +-y
        np.testing.assert_allclose(np.abs(m.geo_n[:, 1]), 1.0, atol=1e-6)

    def test_cube(self):
        m = mesh.cube(2.0)
        assert m.num_tris == 12
        np.testing.assert_allclose(m.areas().sum(), 24.0)
        # normals all unit, outward
        centers = m.positions.mean(axis=1)
        assert np.all(np.einsum("ij,ij->i", centers, m.geo_n) > 0)

    def test_sphere(self):
        m = mesh.sphere([1.0, 2.0, 3.0], 0.5, tessellation=20)
        r = np.linalg.norm(m.positions - np.array([1, 2, 3.0]), axis=-1)
        np.testing.assert_allclose(r, 0.5, atol=1e-6)
        # area approaches 4 pi r^2
        assert m.areas().sum() > 0.95 * 4 * math.pi * 0.25

    def test_cylinder(self):
        m = mesh.cylinder([0, 0, 0], [0, 0, 2], 0.5, phi_tessellation=64)
        # lateral area ~ 2 pi r h
        np.testing.assert_allclose(m.areas().sum(), 2 * math.pi * 0.5 * 2,
                                   rtol=1e-2)

    def test_prism(self):
        m = mesh.prism(6e-3, 1.2e-3, math.pi / 2)
        assert m.num_tris == 8
        assert np.isfinite(m.positions).all()
        # extents: x in +-xlen/2 (= height*tan(45) = 1.2mm -> +-0.6mm)
        assert abs(m.positions[..., 0]).max() <= 0.61e-3

    def test_lens(self):
        m = mesh.lens([0, 0, 0], 1.5e-3, -0.01, -0.06, 0.04e-3,
                      tessellation=16)
        assert m.num_tris > 100
        assert np.isfinite(m.positions).all()


class TestIO:
    def test_ply_ascii_roundtrip(self, tmp_path):
        p = tmp_path / "tri.ply"
        p.write_text(
            "ply\nformat ascii 1.0\n"
            "element vertex 3\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\n"
            "property list uchar int vertex_indices\n"
            "end_header\n"
            "0 0 0\n1 0 0\n0 1 0\n"
            "3 0 1 2\n")
        v, f, n, uv = ply.load_ply(str(p))
        np.testing.assert_allclose(v, [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
        np.testing.assert_array_equal(f, [[0, 1, 2]])
        assert n is None

    def test_ply_binary(self, tmp_path):
        import struct
        p = tmp_path / "tri_b.ply"
        header = (b"ply\nformat binary_little_endian 1.0\n"
                  b"element vertex 3\n"
                  b"property float x\nproperty float y\nproperty float z\n"
                  b"element face 2\n"
                  b"property list uchar int vertex_indices\n"
                  b"end_header\n")
        body = b"".join(struct.pack("<fff", *v) for v in
                        [(0, 0, 0), (1, 0, 0), (0, 1, 1)])
        body += struct.pack("<Biii", 3, 0, 1, 2)
        body += struct.pack("<Biii", 3, 2, 1, 0)
        p.write_bytes(header + body)
        v, f, n, uv = ply.load_ply(str(p))
        assert v.shape == (3, 3) and f.shape == (2, 3)
        np.testing.assert_allclose(v[2], [0, 1, 1])

    def test_obj(self, tmp_path):
        p = tmp_path / "quad.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
                     "vn 0 0 1\n"
                     "f 1//1 2//1 3//1 4//1\n")
        pos, n, uv = obj.load_obj(str(p))
        assert pos.shape == (2, 3, 3)  # fan-triangulated quad
        np.testing.assert_allclose(n[0][0], [0, 0, 1])
        soup = mesh.build_soup_from_corners(pos, n, uv)
        np.testing.assert_allclose(soup.areas().sum(), 1.0)

    def test_reference_bunny_loads(self):
        import pytest
        path = "/root/reference/scenes/cornell-box/bunny/bun_zipper.ply"
        with open(path, "rb") as fh:
            if fh.read(30).startswith(b"version https://git-lfs"):
                pytest.skip("reference asset is a git-lfs stub")
        v, f, n, uv = ply.load_ply(path)
        assert len(v) > 30000 and len(f) > 60000
        soup = mesh.build_soup(v, f, n, uv,
                               Transform.scale(0.01))
        assert soup.num_tris > 60000
        assert np.isfinite(soup.positions).all()
