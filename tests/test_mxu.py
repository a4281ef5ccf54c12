"""MXU all-pairs intersector (accel/mxu_trace.py): parity with the
Moller-Trumbore brute path (reference include/wt/math/intersect/ray.hpp
two-sided semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from wave_tracer_tpu.accel import trace as trace_mod
from wave_tracer_tpu.accel import mxu_trace
from wave_tracer_tpu.geometry import mesh as mesh_mod


def _soup_geo(T=700, seed=0):
    rng = np.random.default_rng(seed)
    p0 = (rng.normal(size=(T, 3)) * 2 + 5.0).astype(np.float32)
    e1 = rng.normal(size=(T, 3)).astype(np.float32)
    e2 = rng.normal(size=(T, 3)).astype(np.float32)
    import types
    center = p0.mean(0)
    return types.SimpleNamespace(
        num_tris=T,
        p0=jnp.asarray(p0), e1=jnp.asarray(e1), e2=jnp.asarray(e2),
        tri_geom=jnp.concatenate(
            [jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2),
             jnp.zeros((T, 3))], axis=1),
        tri_mxu=jnp.asarray(
            mxu_trace.build_tri_features(p0, e1, e2, center)),
        mxu_center=jnp.asarray(center),
    )


def _rays(N=512, seed=1):
    rng = np.random.default_rng(seed)
    ro = (rng.normal(size=(N, 3)) * 3 + 5.0).astype(np.float32)
    rd = rng.normal(size=(N, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_closest_hit_parity():
    geo = _soup_geo()
    ro, rd = _rays()
    N = ro.shape[0]
    tmin = jnp.full((N,), 1e-4)
    tmax = jnp.full((N,), 1e30)
    t0, i0, u0, v0 = trace_mod.trace_brute(geo, ro, rd, tmin, tmax)
    t1, i1, u1, v1 = mxu_trace.trace_mxu(geo, ro, rd, tmin, tmax,
                                         use_pallas=False)
    i0, i1 = np.asarray(i0), np.asarray(i1)
    assert (i0 == i1).mean() > 0.999   # rare near-edge FP flips allowed
    hit = (i0 >= 0) & (i0 == i1)
    assert hit.any()
    np.testing.assert_allclose(np.asarray(t0)[hit], np.asarray(t1)[hit],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(u0)[hit], np.asarray(u1)[hit],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(v0)[hit], np.asarray(v1)[hit],
                               atol=1e-4)


def test_anyhit_and_exclude_parity():
    geo = _soup_geo(seed=3)
    ro, rd = _rays(seed=4)
    N = ro.shape[0]
    tmin = jnp.full((N,), 1e-4)
    tmax = jnp.full((N,), 4.0)
    occ0 = np.asarray(trace_mod.occluded_brute(geo, ro, rd, tmin, tmax))
    occ1 = np.asarray(mxu_trace.occluded_mxu(geo, ro, rd, tmin, tmax,
                                             use_pallas=False))
    assert (occ0 == occ1).mean() > 0.999
    # exclusion removes the winning triangle
    t0, i0, _, _ = mxu_trace.trace_mxu(geo, ro, rd, tmin,
                                       jnp.full((N,), 1e30),
                                       use_pallas=False)
    t2, i2, _, _ = mxu_trace.trace_mxu(geo, ro, rd, tmin,
                                       jnp.full((N,), 1e30), i0,
                                       use_pallas=False)
    hit = np.asarray(i0) >= 0
    assert (np.asarray(i2)[hit] != np.asarray(i0)[hit]).all()


def test_mesh_scene_parity():
    """Real mesh (tessellated sphere) — grazing rays included."""
    m = mesh_mod.sphere([0.0, 0.0, 0.0], 1.0, tessellation=24)
    T = len(m.positions)
    import types
    p0 = m.positions[:, 0].astype(np.float32)
    e1 = (m.positions[:, 1] - m.positions[:, 0]).astype(np.float32)
    e2 = (m.positions[:, 2] - m.positions[:, 0]).astype(np.float32)
    center = p0.mean(0)
    geo = types.SimpleNamespace(
        num_tris=T,
        p0=jnp.asarray(p0), e1=jnp.asarray(e1), e2=jnp.asarray(e2),
        tri_geom=jnp.concatenate(
            [jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2),
             jnp.zeros((T, 3))], axis=1),
        tri_mxu=jnp.asarray(
            mxu_trace.build_tri_features(p0, e1, e2, center)),
        mxu_center=jnp.asarray(center),
    )
    ro, rd = _rays(N=1024, seed=7)
    ro = ro * 0 + jnp.asarray([0.0, 0.0, 3.0])
    N = ro.shape[0]
    tmin = jnp.full((N,), 1e-4)
    tmax = jnp.full((N,), 1e30)
    t0, i0, _, _ = trace_mod.trace_brute(geo, ro, rd, tmin, tmax)
    t1, i1, _, _ = mxu_trace.trace_mxu(geo, ro, rd, tmin, tmax,
                                       use_pallas=False)
    assert (np.asarray(i0) == np.asarray(i1)).mean() > 0.995
