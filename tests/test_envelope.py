"""Elliptic envelope transport state (wave/envelope.py): the reference's
beam.transform_surface_interaction invariants (reference
include/wt/beam/beam.hpp:379-397, elliptic_cone.hpp:30-333)."""

import numpy as np
import jax.numpy as jnp

from wave_tracer_tpu.math import vec
from wave_tracer_tpu.wave import envelope as env_mod


def _env(x=(1.0, 0.0, 0.0), x0=0.0, ta=0.02, e=1.0, n=1):
    return env_mod.EnvState(
        x=jnp.broadcast_to(jnp.asarray(x, jnp.float32), (n, 3)),
        x0=jnp.full((n,), x0, jnp.float32),
        ta=jnp.full((n,), ta, jnp.float32),
        e=jnp.full((n,), e, jnp.float32))


def test_normal_incidence_stays_circular():
    """Circular beam hitting a perpendicular plane keeps e = 1."""
    rd = jnp.asarray([[0.0, 0.0, -1.0]])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    wo = jnp.asarray([[0.0, 0.0, 1.0]])
    env = _env()
    z = jnp.asarray([5.0])
    out, _ = env_mod.surface_scatter(env, rd, z, n, wo,
                                     jnp.asarray([True]), jnp.asarray([1e4]))
    a = float(env.major(z)[0])
    assert abs(float(out.e[0]) - 1.0) < 1e-3
    assert abs(float(out.x0[0]) - a) < 1e-3 * a


def test_grazing_incidence_stretches_footprint():
    """45° incidence: footprint major axis = a/cos(45°), eccentricity of
    the reflected envelope sqrt(stretch) per the reference's
    e = sqrt(major/minor) convention (elliptic_cone.cpp)."""
    th = np.deg2rad(45.0)
    rd = jnp.asarray([[0.0, np.sin(th), -np.cos(th)]], jnp.float32)
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    # specular reflection
    wo = jnp.asarray([[0.0, np.sin(th), np.cos(th)]], jnp.float32)
    env = _env(x=(1.0, 0.0, 0.0))
    z = jnp.asarray([5.0])
    ex, ey = env_mod.footprint_on_surface(env, rd, z, n)
    a = float(env.major(z)[0])
    lx = float(vec.length(ex)[0])
    ly = float(vec.length(ey)[0])
    # x-axis of the beam is ⊥ to the incidence plane → unstretched;
    # y-axis stretches by 1/cos
    np.testing.assert_allclose(lx, a, rtol=1e-3)
    np.testing.assert_allclose(ly, a / np.cos(th), rtol=1e-3)
    # reflected envelope carries the anisotropy (e = sqrt(major/minor))
    out, _ = env_mod.surface_scatter(env, rd, z, n, wo,
                                     jnp.asarray([True]), jnp.asarray([1e4]))
    # the projected footprint seen ⊥ wo: stretched axis re-foreshortens
    # by cos for the specular direction → the specular cone stays round
    assert abs(float(out.e[0]) - 1.0) < 5e-3
    # ...but a NON-specular (normal) outgoing lobe sees the full stretch
    wo_n = jnp.asarray([[0.0, 0.0, 1.0]])
    out2, _ = env_mod.surface_scatter(env, rd, z, n, wo_n,
                                      jnp.asarray([False]),
                                      jnp.asarray([1e4]))
    np.testing.assert_allclose(float(out2.e[0]),
                               np.sqrt(1.0 / np.cos(th)), rtol=2e-2)
    np.testing.assert_allclose(float(out2.x0[0]), a / np.cos(th),
                               rtol=1e-3)


def test_footprint_feeds_aperture_scale():
    """The envelope's major axis grows linearly and area_radius is the
    geometric mean."""
    env = _env(x0=0.1, ta=0.05, e=2.0)
    z = jnp.asarray([4.0])
    a = float(env.major(z)[0])
    b = float(env.minor(z)[0])
    np.testing.assert_allclose(a, 0.1 + 0.05 * 4.0, rtol=1e-6)
    np.testing.assert_allclose(b, a / 2.0, rtol=1e-6)
    np.testing.assert_allclose(float(env.area_radius(z)[0]),
                               np.sqrt(a * b), rtol=1e-6)


def test_select_blends_lanes():
    a = _env(x0=1.0, n=4)
    b = _env(x0=2.0, n=4)
    c = env_mod.select(jnp.asarray([True, False, True, False]), a, b)
    np.testing.assert_allclose(np.asarray(c.x0), [1.0, 2.0, 1.0, 2.0])
