"""Exact cone-primitive intersection kernels vs dense sampling oracles.

Reference behaviours: include/wt/math/intersect/cone.hpp:39-128
(cone-edge), :171 (cone-plane), :550-627 (intersect_cone_tri minimal
entry point).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from wave_tracer_tpu.ops import cone_intersect as ci


def _inside(x0, ta, p, zmin=0.0, zmax=np.inf):
    z = p[..., 2]
    r = x0 + ta * z
    return (z >= zmin) & (z <= zmax) & (r > 0) \
        & (p[..., 0] ** 2 + p[..., 1] ** 2 <= r * r)


def _oracle_edge(x0, ta, A, B, zmin, zmax, n=20001):
    s = np.linspace(0.0, 1.0, n)
    P = A[None] + s[:, None] * (B - A)[None]
    ok = _inside(x0, ta, P, zmin, zmax)
    if not ok.any():
        return None
    return P[ok][:, 2].min()

def _oracle_tri(x0, ta, A, B, C, zmin, zmax, n=260):
    u, v = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
    m = u + v <= 1.0
    u, v = u[m], v[m]
    P = A[None] + u[:, None] * (B - A)[None] + v[:, None] * (C - A)[None]
    ok = _inside(x0, ta, P, zmin, zmax)
    if not ok.any():
        return None
    return P[ok][:, 2].min()


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_cone_edge_entry_vs_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 64
    x0 = rng.uniform(0.0, 0.5, n).astype(np.float32)
    ta = rng.uniform(0.01, 0.6, n).astype(np.float32)
    A = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    B = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    A[:, 2] = rng.uniform(-0.5, 4, n)
    B[:, 2] = rng.uniform(-0.5, 4, n)
    z, s, valid = ci.cone_edge_entry(
        jnp.asarray(x0), jnp.asarray(ta), jnp.asarray(A), jnp.asarray(B),
        0.0, 10.0)
    z = np.asarray(z)
    valid = np.asarray(valid)
    for i in range(n):
        zo = _oracle_edge(x0[i], ta[i], A[i], B[i], 0.0, 10.0)
        if zo is None:
            # oracle found no inside point; allow boundary-grazing hits
            if valid[i]:
                P = A[i] + np.asarray(s)[i] * (B[i] - A[i])
                r = x0[i] + ta[i] * P[2]
                assert np.hypot(P[0], P[1]) <= r * (1 + 5e-2) + 1e-4
        else:
            assert valid[i], f"lane {i}: oracle {zo} but kernel missed"
            assert z[i] <= zo + 2e-3
            assert z[i] >= zo - 2e-2  # oracle discretization slack


@pytest.mark.parametrize("seed", [0, 1, 2, 5])
def test_cone_tri_entry_vs_oracle(seed):
    rng = np.random.default_rng(100 + seed)
    n = 48
    x0 = rng.uniform(0.0, 0.3, n).astype(np.float32)
    ta = rng.uniform(0.02, 0.5, n).astype(np.float32)
    A = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    B = A + rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    C = A + rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    for V in (A, B, C):
        V[:, 2] = rng.uniform(-0.5, 3.5, n)
    z, p, valid = ci.intersect_cone_tri(
        jnp.asarray(x0), jnp.asarray(ta), jnp.asarray(A),
        jnp.asarray(B), jnp.asarray(C), 0.0, 10.0)
    z = np.asarray(z)
    p = np.asarray(p)
    valid = np.asarray(valid)
    for i in range(n):
        zo = _oracle_tri(x0[i], ta[i], A[i], B[i], C[i], 0.0, 10.0)
        if zo is None:
            if valid[i]:
                # must at least be a near-boundary point
                r = x0[i] + ta[i] * p[i, 2]
                assert np.hypot(p[i, 0], p[i, 1]) <= r * 1.05 + 1e-3
        else:
            assert valid[i], f"lane {i}: oracle {zo} but kernel missed"
            assert z[i] <= zo + 3e-3, f"lane {i}: {z[i]} > oracle {zo}"
            assert z[i] >= zo - 6e-2
            # the entry point must lie (approximately) on the triangle
            # plane and inside the cone
            nrm = np.cross(B[i] - A[i], C[i] - A[i])
            nrm = nrm / max(np.linalg.norm(nrm), 1e-12)
            # vertex-inside / edge candidates lie ON the triangle
            d_plane = abs(np.dot(p[i] - A[i], nrm))
            assert d_plane < 5e-2


def test_entry_point_respects_zwindow():
    # a big triangle crossing the window start: entry z clamps to zmin
    x0 = jnp.asarray([0.1])
    ta = jnp.asarray([0.2])
    A = jnp.asarray([[-5.0, -0.01, -1.0]])
    B = jnp.asarray([[5.0, -0.01, -1.0]])
    C = jnp.asarray([[0.0, -0.01, 9.0]])
    z, p, valid = ci.intersect_cone_tri(x0, ta, A, B, C, 1.0, 8.0)
    assert bool(valid[0])
    assert abs(float(z[0]) - 1.0) < 1e-5


def test_contains_matches_radius():
    x0 = jnp.asarray([0.5])
    ta = jnp.asarray([0.1])
    p_in = jnp.asarray([[0.55, 0.0, 1.0]])   # r(1) = 0.6
    p_out = jnp.asarray([[0.65, 0.0, 1.0]])
    assert bool(ci.cone_contains(x0, ta, p_in, 0.0, 10.0)[0])
    assert not bool(ci.cone_contains(x0, ta, p_out, 0.0, 10.0)[0])


def test_plane_entry_perpendicular():
    # plane z = 2 (normal along axis): conic = disk at z=2
    x0 = jnp.asarray([0.2])
    ta = jnp.asarray([0.1])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    z, pxy, valid = ci.cone_plane_entry(x0, ta, n, jnp.asarray([2.0]),
                                        0.0, 10.0)
    assert bool(valid[0])
    assert abs(float(z[0]) - 2.0) < 1e-6
