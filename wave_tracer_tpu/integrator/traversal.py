"""Hybrid ballistic/diffusive traversal — closed-form segment schedule.

TPU re-design of reference include/wt/integrator/traversal.hpp:39-333.
The reference alternates per path: ray-trace a short ballistic segment of
B_j = min(8·2^(2j+1), 65536) wavelengths; on a miss, attempt a diffusive
full-cone intersection from the segment boundary, accepted only when the
earliest cone encounter progresses at least half the envelope's major
axis past the boundary (and the encounter precedes the central-ray hit);
otherwise continue ballistic. After 16 segments the final ballistic
segment extends to infinity.

Because the segment boundaries d_j = Σ B_i·λ are data-independent given
λ, the whole schedule collapses into pure per-lane masked arithmetic
over ONE full-range ray trace plus ONE exact cone-triangle set sweep
(accel/trace.py::tris_near_cone) — no per-segment traces, no divergent
loops. The scan over the 16 boundaries is unrolled vector math.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import struct

BIG = 1e30
MAX_SEGMENTS = 16
SEG_LAMBDAS = 8           # B_j = min(8 << (2j+1), 1<<16) (traversal.hpp:44-46)
MAX_SEG_LAMBDAS = 1 << 16
# z-extent of the interaction region relative to the major axis
# (reference beam_generic.hpp:50 major_axis_to_z_scale)
Z_SCALE = 2.0


def segment_boundaries(lam):
    """Cumulative ballistic boundaries d_1..d_16 (per lane).

    lam (N,) wavelength in metres. Returns (N, 16): d_{j+1} = d_j + B_j·λ
    with B_j = min(8·2^(2j+1), 65536) (traversal.hpp max_ballistic_distance).
    """
    B = [min(SEG_LAMBDAS << (2 * j + 1), MAX_SEG_LAMBDAS)
         for j in range(MAX_SEGMENTS)]
    cum = jnp.asarray(
        [sum(B[:j + 1]) for j in range(MAX_SEGMENTS)], jnp.float32)
    return lam[:, None] * cum[None, :]


@struct.dataclass
class TraversalResult:
    ballistic: jnp.ndarray   # (N,) bool — interaction from a ray hit
    diffusive: jnp.ndarray   # (N,) bool — interaction from a cone region
    z_region: jnp.ndarray    # (N,) region start (diffusive) / hit z
    escaped: jnp.ndarray     # (N,) bool — no interaction within dist_max


def schedule(t_ray, ray_hit, tz, env, lam, dist_max,
             tol_scale: float = 1e-3):
    """Evaluate the ballistic/diffusive schedule per lane.

    t_ray (N,): central-ray closest hit distance (BIG on miss);
    ray_hit (N,) bool; tz (N, K): ascending exact cone-triangle entry
    distances (inf-padded) from tris_near_cone; env: EnvState; lam (N,)
    wavelength [m]; dist_max (N,).

    Mirrors traversal.hpp:114-161: per boundary d, ballistic wins when
    the ray hit falls before d; otherwise the earliest tri encounter
    z_c ≥ d is accepted as a diffusive region iff z_c − d ≥ major(d)/2
    and z_c ≤ t_ray (the reference's too-short-progress rule: a cone
    still grazing already-passed geometry keeps the traversal ballistic);
    an empty encounter set ahead means the beam escapes.
    """
    N = t_ray.shape[0]
    bounds = segment_boundaries(lam)            # (N, 16)
    t_eff = jnp.where(ray_hit, t_ray, BIG)

    decided = jnp.zeros((N,), bool)
    ballistic = jnp.zeros((N,), bool)
    diffusive = jnp.zeros((N,), bool)
    escaped = jnp.zeros((N,), bool)
    z_region = jnp.where(ray_hit, t_eff, 0.0)

    for j in range(MAX_SEGMENTS):
        d = bounds[:, j]
        # ballistic segment j covers (d_{j-1}, d_j]
        b_now = ~decided & (t_eff <= d)
        ballistic = ballistic | b_now
        decided = decided | b_now
        # diffusive attempt at d (only reached when the segment missed)
        zc = jnp.min(jnp.where(tz >= d[:, None], tz, jnp.inf), axis=1)
        none_ahead = ~jnp.isfinite(zc)
        maj = env.major(d)
        ok = jnp.isfinite(zc) & (zc - d >= 0.5 * maj) & (zc <= t_eff) \
            & (zc < dist_max)
        e_now = ~decided & none_ahead & (t_eff >= BIG)
        d_now = ~decided & ok
        escaped = escaped | e_now
        diffusive = diffusive | d_now
        z_region = jnp.where(d_now, zc, z_region)
        decided = decided | e_now | d_now

    # final unbounded ballistic segment (traversal.hpp:133-138)
    b_fin = ~decided & ray_hit & (t_eff < dist_max)
    ballistic = ballistic | b_fin
    escaped = escaped | (~decided & ~b_fin)
    z_region = jnp.where(ballistic, t_eff, z_region)
    return TraversalResult(ballistic=ballistic, diffusive=diffusive,
                           z_region=z_region, escaped=escaped)


def schedule_from_minz(t_ray, ray_hit, zc, env, lam, dist_max):
    """`schedule` variant consuming per-boundary earliest-encounter
    minima zc (N, 16) from accel.trace.cone_boundary_minz instead of a
    top-K encounter list. Exactly the same decision rule — but the sweep
    never has to SORT encounters (zc[:, j] IS min{z : z ≥ d_j}), and it
    sees every encounter rather than a K-capped subset."""
    N = t_ray.shape[0]
    bounds = segment_boundaries(lam)
    t_eff = jnp.where(ray_hit, t_ray, BIG)

    decided = jnp.zeros((N,), bool)
    ballistic = jnp.zeros((N,), bool)
    diffusive = jnp.zeros((N,), bool)
    escaped = jnp.zeros((N,), bool)
    z_region = jnp.where(ray_hit, t_eff, 0.0)

    for j in range(MAX_SEGMENTS):
        d = bounds[:, j]
        b_now = ~decided & (t_eff <= d)
        ballistic = ballistic | b_now
        decided = decided | b_now
        zcj = zc[:, j]
        none_ahead = ~jnp.isfinite(zcj)
        maj = env.major(d)
        ok = jnp.isfinite(zcj) & (zcj - d >= 0.5 * maj) \
            & (zcj <= t_eff) & (zcj < dist_max)
        e_now = ~decided & none_ahead & (t_eff >= BIG)
        d_now = ~decided & ok
        escaped = escaped | e_now
        diffusive = diffusive | d_now
        z_region = jnp.where(d_now, zcj, z_region)
        decided = decided | e_now | d_now

    b_fin = ~decided & ray_hit & (t_eff < dist_max)
    ballistic = ballistic | b_fin
    escaped = escaped | (~decided & ~b_fin)
    z_region = jnp.where(ballistic, t_eff, z_region)
    return TraversalResult(ballistic=ballistic, diffusive=diffusive,
                           z_region=z_region, escaped=escaped)


def region_depth(env, z):
    """Interaction-region z-depth at distance z: Z_SCALE × major axis
    (reference ads.hpp z_search_range_scale semantics)."""
    return Z_SCALE * env.major(z)
