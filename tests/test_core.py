"""Unit tests for core quantity parsing, expressions, frames, transforms."""

import math

import numpy as np
import pytest

from wave_tracer_tpu.core import expr, quantity
from wave_tracer_tpu.core.transform import Transform


class TestExpr:
    def test_arith(self):
        assert expr.evaluate("1+2*3") == 7
        assert expr.evaluate("(1+2)*3") == 9
        assert expr.evaluate("2^3") == 8
        assert expr.evaluate("-2^2") == -4  # unary binds looser than ^
        assert expr.evaluate("10/4") == 2.5

    def test_bool(self):
        assert expr.evaluate("(1==1 && 0==0)") == 1.0
        assert expr.evaluate("(true==true && false==false)") == 1.0
        assert expr.evaluate("1==2 || 3>2") == 1.0
        assert expr.evaluate("!(1==1)") == 0.0

    def test_vars_funcs(self):
        assert expr.evaluate("$x/4".replace("$x", "8")) == 2.0
        assert expr.evaluate("res/4", {"res": 1024}) == 256
        assert abs(expr.evaluate("sin(pi/2)") - 1.0) < 1e-12
        assert expr.evaluate("max(2, 3)") == 3

    def test_bool_helper(self):
        assert expr.evaluate_bool("true")
        assert not expr.evaluate_bool("false")
        assert expr.evaluate_bool("(1==1 && 1==1)")


class TestQuantity:
    def test_lengths(self):
        assert quantity.parse_quantity("2cm").value == pytest.approx(0.02)
        assert quantity.parse_quantity(".05mm").value == pytest.approx(5e-5)
        assert quantity.parse_quantity("400nm").value == pytest.approx(4e-7)
        assert quantity.parse_quantity("1.5m").dim == "length"

    def test_angle(self):
        q = quantity.parse_quantity("19.75°")
        assert q.dim == "angle"
        assert q.value == pytest.approx(math.radians(19.75))
        assert quantity.parse_quantity("1rad").value == 1.0

    def test_freq_wavelength(self):
        q = quantity.parse_quantity("10GHz")
        assert q.dim == "frequency"
        lam = quantity.wavelength_m(q)
        assert lam == pytest.approx(0.0299792458)

    def test_expr_quantity(self):
        q = quantity.parse_quantity("(250/4) mm")
        assert q.value == pytest.approx(0.0625)

    def test_vector(self):
        v = quantity.parse_quantity_vector("0cm, 1cm, 6.8cm")
        assert [x.value for x in v] == pytest.approx([0.0, 0.01, 0.068])

    def test_range(self):
        a, b = quantity.parse_range("300nm .. 800nm")
        assert a.value == pytest.approx(3e-7)
        assert b.value == pytest.approx(8e-7)
        a, b = quantity.parse_range("-18 .. 25")
        assert (a.value, b.value) == (-18.0, 25.0)

    def test_complex(self):
        assert quantity.parse_complex("(1,100i)") == complex(1, 100)
        assert quantity.parse_complex("1.5") == complex(1.5, 0)

    def test_temperature(self):
        assert quantity.parse_quantity("7000K").dim == "temperature"


class TestTransform:
    def test_lookat_maps_z_to_dir(self):
        t = Transform.lookat([0, 1, 6.8], [0, 1, 0], [0, 1, 0])
        d = t.apply_vector([0, 0, 1])
        np.testing.assert_allclose(d, [0, 0, -1], atol=1e-12)
        np.testing.assert_allclose(t.apply_point([0, 0, 0]), [0, 1, 6.8])

    def test_lookat_orthonormal(self):
        t = Transform.lookat([1, 2, 3], [-4, 0, 2], [0, 1, 0])
        R = t.linear
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-12)

    def test_compose_order(self):
        # rotate then translate: p=(1,0,0) rotated 90deg about z -> (0,1,0),
        # then translated by (5,0,0) -> (5,1,0)
        t = Transform.translate([5, 0, 0]) @ Transform.rotate([0, 0, 1], math.pi / 2)
        np.testing.assert_allclose(t.apply_point([1, 0, 0]), [5, 1, 0], atol=1e-12)

    def test_normal_transform(self):
        t = Transform.scale([2, 1, 1])
        n = t.apply_normal([1, 0, 0])
        np.testing.assert_allclose(n, [1, 0, 0])
        np.testing.assert_allclose(np.linalg.norm(n), 1.0)


class TestFrames:
    def test_orthogonal_frame(self):
        import jax.numpy as jnp

        from wave_tracer_tpu.math import frame as fr
        from wave_tracer_tpu.math import vec

        n = vec.normalize(jnp.array([[0.3, -0.5, 0.81], [0.0, 1.0, 0.0],
                                     [1.0, 0.0, 0.0]]))
        f = fr.build_orthogonal_frame(n)
        for a, b in [(f.t, f.b), (f.t, f.n), (f.b, f.n)]:
            np.testing.assert_allclose(vec.dot(a, b), 0.0, atol=1e-6)
        np.testing.assert_allclose(vec.length(f.t), 1.0, atol=1e-6)
        # right-handed: t x b = n
        np.testing.assert_allclose(jnp.cross(f.t, f.b), f.n, atol=1e-6)

    def test_to_local_world_roundtrip(self):
        import jax.numpy as jnp

        from wave_tracer_tpu.math import frame as fr
        from wave_tracer_tpu.math import vec

        n = vec.normalize(jnp.array([[0.2, 0.9, -0.4]]))
        f = fr.build_orthogonal_frame(n)
        v = jnp.array([[0.3, -1.2, 2.0]])
        np.testing.assert_allclose(f.to_world(f.to_local(v)), v, atol=1e-5)

    def test_shading_frame_tangent_alignment(self):
        import jax.numpy as jnp

        from wave_tracer_tpu.math import frame as fr
        from wave_tracer_tpu.math import vec

        n = jnp.array([[0.0, 0.0, 1.0]])
        dpdu = jnp.array([[2.0, 0.5, 0.0]])
        f = fr.build_shading_frame(n, dpdu)
        t = f.t / vec.length(f.t)[..., None]
        # tangent lies in the plane spanned by dpdu projected off n
        np.testing.assert_allclose(vec.dot(t, n), 0.0, atol=1e-6)
        assert float(vec.dot(t, vec.normalize(dpdu))[0]) > 0.9
