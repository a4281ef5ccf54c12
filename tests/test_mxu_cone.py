"""Equivalence of the MXU/VMEM dense cone-boundary kernel against the
XLA sweep (accel.trace.cone_boundary_minz) — same exact entry math,
different execution strategy (VERDICT r4 item 6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wave_tracer_tpu.accel import mxu_cone
from wave_tracer_tpu.accel import trace as trace_mod
from wave_tracer_tpu.integrator import traversal as traversal_mod
from wave_tracer_tpu.wave.envelope import EnvState


def _random_scene(T, seed=0):
    rng = np.random.default_rng(seed)
    p0 = rng.uniform(-4, 4, (T, 3)).astype(np.float32)
    e1 = rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    e2 = rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    return p0, e1, e2


class _Geo:
    def __init__(self, p0, e1, e2):
        self.p0 = jnp.asarray(p0)
        self.e1 = jnp.asarray(e1)
        self.e2 = jnp.asarray(e2)
        self.num_tris = len(p0)
        self.cone_feat = jnp.asarray(
            mxu_cone.build_cone_tri_features(p0, e1, e2))


def _lanes(N, seed=1):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-5, 5, (N, 3)).astype(np.float32)
    rd = rng.normal(size=(N, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    xh = np.cross(rd, np.roll(rd, 1, axis=-1)
                  + np.array([0.11, 0.37, 0.53], np.float32))
    xh /= np.linalg.norm(xh, axis=-1, keepdims=True)
    env = EnvState(x=jnp.asarray(xh),
                   x0=jnp.asarray(rng.uniform(0.01, 0.3, N)
                                  .astype(np.float32)),
                   ta=jnp.asarray(rng.uniform(0.01, 0.2, N)
                                  .astype(np.float32)),
                   e=jnp.asarray(rng.uniform(0.6, 1.0, N)
                                 .astype(np.float32)))
    return jnp.asarray(ro), jnp.asarray(rd), env


def test_minz_matches_xla_sweep():
    T, N = 700, 64
    p0, e1, e2 = _random_scene(T)
    geo = _Geo(p0, e1, e2)
    ro, rd, env = _lanes(N)
    lam = jnp.full((N,), 0.05)
    bounds = traversal_mod.segment_boundaries(lam)
    zmax = jnp.full((N,), 30.0)
    exclude = jnp.arange(N, dtype=jnp.int32) % T

    zc_ref, cnt_ref = trace_mod.cone_boundary_minz(
        geo, ro, rd, env, bounds, zmax, exclude_tri=exclude)
    zc, cnt = mxu_cone.cone_boundary_minz_mxu(
        geo, ro, rd, env, bounds, zmax, exclude_tri=exclude,
        use_pallas=False)

    finite = np.isfinite(np.asarray(zc_ref))
    assert (np.isfinite(np.asarray(zc)) == finite).mean() > 0.999
    a = np.asarray(zc)[finite]
    b = np.asarray(zc_ref)[finite]
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
    # counts: exact entry sets agree up to boundary-rounding stragglers
    assert (np.abs(np.asarray(cnt) - np.asarray(cnt_ref))
            <= np.maximum(2, 0.02 * np.asarray(cnt_ref))).mean() > 0.97


def test_minz_pallas_lowers_on_tpu():
    if jax.devices()[0].platform.lower() != "tpu":
        pytest.skip("pallas TPU kernel needs a TPU")
    T, N = 700, 256
    p0, e1, e2 = _random_scene(T, seed=3)
    geo = _Geo(p0, e1, e2)
    ro, rd, env = _lanes(N, seed=4)
    bounds = traversal_mod.segment_boundaries(jnp.full((N,), 0.05))
    zmax = jnp.full((N,), 30.0)
    zc, cnt = mxu_cone.cone_boundary_minz_mxu(
        geo, ro, rd, env, bounds, zmax, use_pallas=True)
    zr, cr = mxu_cone.cone_boundary_minz_mxu(
        geo, ro, rd, env, bounds, zmax, use_pallas=False)
    finite = np.isfinite(np.asarray(zr))
    assert (np.isfinite(np.asarray(zc)) == finite).mean() > 0.999
    np.testing.assert_allclose(np.asarray(zc)[finite],
                               np.asarray(zr)[finite],
                               rtol=5e-3, atol=5e-3)
