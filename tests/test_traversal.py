"""Hybrid ballistic/diffusive schedule (reference traversal.hpp:39-161)."""

import numpy as np
import jax.numpy as jnp

from wave_tracer_tpu.integrator import traversal as trav
from wave_tracer_tpu.wave.envelope import EnvState

BIG = trav.BIG


def _env(n, x0=0.001, ta=0.01):
    return EnvState(x=jnp.tile(jnp.asarray([[1.0, 0, 0]]), (n, 1)),
                    x0=jnp.full((n,), x0), ta=jnp.full((n,), ta),
                    e=jnp.ones((n,)))


def _run(t_ray, tz, lam=0.5e-6, x0=0.001, ta=0.01, dist_max=100.0):
    n = len(t_ray)
    t = jnp.asarray(t_ray, jnp.float32)
    res = trav.schedule(
        t, t < BIG, jnp.asarray(tz, jnp.float32), _env(n, x0, ta),
        jnp.full((n,), lam, jnp.float32), jnp.full((n,), dist_max))
    return (np.asarray(res.ballistic), np.asarray(res.diffusive),
            np.asarray(res.z_region), np.asarray(res.escaped))


def test_boundaries_growth():
    lam = jnp.asarray([1.0])
    b = np.asarray(trav.segment_boundaries(lam))[0]
    # B_j = 16, 64, 256, ... capped at 65536
    assert b[0] == 16
    assert b[1] == 16 + 64
    assert b[2] == 16 + 64 + 256
    assert np.all(np.diff(b) > 0)
    assert b[-1] - b[-2] == 65536


def test_close_hit_is_ballistic():
    # hit within the first segment (16 lambda)
    bal, dif, z, esc = _run([5 * 0.5e-6], [[np.inf] * 4])
    assert bal[0] and not dif[0] and not esc[0]
    assert abs(z[0] - 5 * 0.5e-6) < 1e-9


def test_wall_ahead_is_diffusive():
    # cone entry well past every early boundary, axis hit on the wall
    bal, dif, z, esc = _run([2.0], [[1.9, np.inf, np.inf, np.inf]])
    assert dif[0] and not bal[0] and not esc[0]
    assert abs(z[0] - 1.9) < 1e-6


def test_empty_scene_escapes():
    bal, dif, z, esc = _run([BIG], [[np.inf] * 4])
    assert esc[0] and not bal[0] and not dif[0]


def test_grazing_origin_geometry_skipped():
    # only encounter is the origin's own surface at z ~ 0: entries below
    # every boundary are ballistically passed; the far hit stays ballistic
    bal, dif, z, esc = _run([3.0], [[1e-6, np.inf, np.inf, np.inf]])
    assert bal[0] and not dif[0]
    assert abs(z[0] - 3.0) < 1e-6


def test_encounter_past_ray_hit_stays_ballistic():
    # earliest cone encounter lies beyond the central-ray hit: the
    # reference's too-short-progress rule keeps the traversal ballistic
    bal, dif, z, esc = _run([2.0], [[4.0, np.inf, np.inf, np.inf]])
    assert bal[0] and not dif[0]
    assert abs(z[0] - 2.0) < 1e-6


def test_too_short_progress_rejected_until_later_boundary():
    # a wide envelope: encounter barely past the boundary is rejected
    # (progress < major/2) but a later narrow-beam lane accepts
    lam = 1e-2  # radio-ish, d_1 = 0.16
    # wide beam: major(d) ~ 1.0 -> needs z_c - d >= 0.5
    bal, dif, z, esc = _run([BIG], [[0.2, np.inf, np.inf, np.inf]],
                            lam=lam, x0=1.0, ta=0.0)
    # encounter at 0.2: at d_1=0.16 progress 0.04 < 0.5 -> reject; at
    # later boundaries z_c < d -> none ahead; no ray hit -> escape
    assert esc[0] and not dif[0]
    # narrow beam accepts the same encounter
    bal, dif, z, esc = _run([BIG], [[0.2, np.inf, np.inf, np.inf]],
                            lam=lam, x0=1e-4, ta=1e-4)
    assert dif[0]
    assert abs(z[0] - 0.2) < 1e-6


def test_schedule_from_minz_matches_topk():
    """The min-z sweep + schedule_from_minz must reproduce the top-K
    sweep + schedule decisions wherever K=16 covers all encounters (the
    min-z form sees EVERY encounter, so it is the more exact one)."""
    import numpy as np
    import jax.numpy as jnp
    from tests.test_trace import make_geo
    from wave_tracer_tpu.accel import trace as trace_mod
    from wave_tracer_tpu.geometry import mesh
    from wave_tracer_tpu.integrator import traversal as tr_mod
    from wave_tracer_tpu.wave.envelope import EnvState

    soup = mesh.sphere([0, 0, 0], 1.0, tessellation=16)
    geo, _ = make_geo(soup)
    n = 128
    r = np.random.default_rng(5)
    ro = r.normal(size=(n, 3))
    ro = 3.0 * ro / np.linalg.norm(ro, axis=1, keepdims=True)
    aim = 0.4 * r.normal(size=(n, 3))
    rd = aim - ro
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    x = np.cross(rd, [0.0, 0.57, 0.8])
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    env = EnvState(x=jnp.asarray(x, jnp.float32),
                   x0=jnp.asarray(r.uniform(0.001, 0.02, n), jnp.float32),
                   ta=jnp.asarray(r.uniform(0.0, 0.03, n), jnp.float32),
                   e=jnp.ones((n,), jnp.float32))
    ro = jnp.asarray(ro, jnp.float32)
    rd = jnp.asarray(rd, jnp.float32)
    zmax = jnp.full((n,), 10.0)
    lam = jnp.full((n,), 5e-4)
    t_ray = jnp.full((n,), 2.0)
    ray_hit = jnp.ones((n,), bool)

    K = 16
    _, tz, cnt = trace_mod.tris_near_cone(geo, ro, rd, env, zmax, K)
    tr_a = tr_mod.schedule(t_ray, ray_hit, tz, env, lam, zmax)
    bounds = tr_mod.segment_boundaries(lam)
    zc, cnt2 = trace_mod.cone_boundary_minz(geo, ro, rd, env, bounds,
                                            zmax)
    tr_b = tr_mod.schedule_from_minz(t_ray, ray_hit, zc, env, lam, zmax)

    covered = np.asarray(cnt) < K     # top-K saw everything
    for field in ("ballistic", "diffusive", "escaped"):
        a = np.asarray(getattr(tr_a, field))[covered]
        b = np.asarray(getattr(tr_b, field))[covered]
        assert (a == b).all(), field
    za = np.asarray(tr_a.z_region)[covered]
    zb = np.asarray(tr_b.z_region)[covered]
    np.testing.assert_allclose(zb, za, rtol=1e-5, atol=1e-6)
    # uncapped count ≥ capped count
    assert (np.asarray(cnt2) >= np.asarray(cnt)).all()
