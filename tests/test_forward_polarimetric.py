"""Forward transport: Stokes carry + FSD-NEE connections.

Reference behaviours: forward beams carry stokes_parameters_t
(include/wt/beam/beam.hpp:31-248); nee_forward connects every FSD
aperture to a sampled virtual-sensor point (plt_path_detail.hpp:469-510).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from wave_tracer_tpu.sampling import rng
from wave_tracer_tpu.scene.build import build_scene


def _coverage_scene(res=16, polarimetric=False):
    from tests.test_coverage import make_coverage_scene
    scene = make_coverage_scene(res=res)
    scene.sensors[0].polarimetric = polarimetric
    return scene


def _trace(scene, N=128, max_depth=4, fsd=True):
    from wave_tracer_tpu.integrator.plt_path_forward import trace_forward
    built = build_scene(scene)
    data = built.data.replace(spectral=built.spectral_per_sensor[0])
    sensor = scene.sensors[0]
    lane_ids = jnp.arange(N, dtype=jnp.int32)
    sids = jnp.zeros((N,), jnp.int32)
    key = rng.make_base_key(7)
    return trace_forward(
        data, lane_ids, key, sids, sensor=sensor,
        edge_table=data.edges, max_depth=max_depth, eps=1e-4, fsd=fsd), \
        sensor


def test_forward_carries_stokes_polarization():
    """Oblique reflections off the SPM surface polarize the beam: some
    recorded crossing must show nonzero Q or U (the reference's forward
    Stokes transport; scalar transport cannot produce this)."""
    (pos, values, ok, sig, nee), sensor = _trace(
        _coverage_scene(polarimetric=True), N=256)
    assert values.shape[-1] == 4        # monochromatic response × IQUV
    v = np.asarray(values)[np.asarray(ok)]
    nv = np.asarray(nee[1])[np.asarray(nee[2])]
    allv = np.concatenate([v, nv], axis=0) if len(nv) else v
    assert len(allv) > 0
    # I is nonnegative and dominates
    assert (allv[:, 0] >= -1e-6).all()
    # at least one bounced connection carries linear polarization
    dop = np.abs(allv[:, 1:3]).max(axis=1) / np.maximum(allv[:, 0], 1e-20)
    assert (dop > 1e-3).any(), "no polarization reached the sensor"
    assert (dop < 1.0 + 1e-3).all(), "unphysical degree of polarization"


def test_forward_intensity_matches_nonpolarimetric():
    """The polarimetric film's I channel must equal the scalar render."""
    (p1, v1, ok1, s1, nee1), _ = _trace(_coverage_scene(), N=64)
    (p2, v2, ok2, s2, nee2), _ = _trace(
        _coverage_scene(polarimetric=True), N=64)
    np.testing.assert_allclose(np.asarray(v1)[:, 0],
                               np.asarray(v2)[:, 0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(nee1[1])[:, 0],
                               np.asarray(nee2[1])[:, 0], rtol=1e-5)
    assert bool(jnp.array_equal(ok1, ok2))


def test_fsd_nee_connections_exist_behind_occluder():
    """FSD-NEE must land connections (reference nee_forward): with
    diffracting geometry between TX and the plane, some per-depth NEE
    records must be valid and positive."""
    (pos, values, ok, sig, nee), sensor = _trace(_coverage_scene(), N=256)
    nee_pos, nee_val, nee_ok = nee
    n_ok = int(np.asarray(nee_ok).sum())
    assert n_ok > 0, "no FSD-NEE connections recorded"
    vals = np.asarray(nee_val)[np.asarray(nee_ok)]
    assert np.isfinite(vals).all()
    assert (vals[:, 0] >= 0).all()
    # positions must be inside the element grid
    p = np.asarray(nee_pos)[np.asarray(nee_ok)]
    assert (p[:, 0] >= 0).all() and (p[:, 0] <= sensor.width).all()
    assert (p[:, 1] >= 0).all() and (p[:, 1] <= sensor.height).all()


def test_fsd_nee_off_when_fsd_disabled():
    (pos, values, ok, sig, nee), _ = _trace(_coverage_scene(), N=64,
                                            fsd=False)
    assert not bool(np.asarray(nee[2]).any())
