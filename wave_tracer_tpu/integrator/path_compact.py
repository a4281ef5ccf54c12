"""Compacted persistent-wavefront classical/wave renderer.

The batched renderer (trace_paths) runs every lane to max_depth: lanes
killed by russian roulette or escape ride the remaining bounces as dead
weight (~40% of all lane-bounces on the cornell box at depth 8). Here the
wavefront is PERSISTENT: a fixed pool of lanes is kept saturated — a lane
that dies splats its radiance into the film and immediately restarts as
the next (pixel, sample) id from the launch's id range. This is the
classic wavefront-compaction design (the reference's thread pool achieves
the same occupancy by construction, src/scene/render.cpp:381-579).

Two drivers share the same pool step:

* ``make_compact_kernel`` — ONE device dispatch: ``lax.while_loop`` runs
  the pool to exhaustion. Fastest where it compiles (CPU; classical on
  the axon TPU backend).
* ``make_stepped_kernel`` — the loop lives on the HOST: one jitted step =
  splat-dead + refill + one bounce, state donated between calls. Warm
  dispatch latency is ~0.2 ms against a multi-hundred-ms bounce, so the
  host loop costs <1%; crucially it (a) avoids the axon compiler wedge on
  the wave bounce inside a persistent while_loop and (b) runs the bounce
  as a top-level jit body, sidestepping the measured 3-4x in-device-loop
  scheduling penalty (CLAUDE.md perf model).

RNG streams are keyed by (pixel, sample, depth, use) — independent of the
lane slot — so the compacted renderers trace EXACTLY the same paths as
the batched one; images agree to splat-order rounding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from wave_tracer_tpu.integrator.path import (N_STATS, _perp_axis,
                                             classical_bounce)
from wave_tracer_tpu.sampling import rng
from wave_tracer_tpu.sensor import film as film_mod
from wave_tracer_tpu.wave import envelope as env_mod
from wave_tracer_tpu.wave import fsd as fsd_mod


def _pool_parts(sensor, max_depth, eps, mis, rr_depth, rr_floor,
                with_stats, wave, fsd, K):
    """Shared pool machinery: fresh-lane sourcing, develop-to-channels,
    and the one-bounce body, parameterized over (data, base_key, id_end)
    so both the device-loop and host-stepped drivers can reuse them."""
    from wave_tracer_tpu.integrator.plt_path import wave_bounce
    W, H = sensor.width, sensor.height
    npix = W * H
    polarimetric = bool(getattr(sensor, "polarimetric", False))

    def fresh(data, base_key, N, ids):
        """Camera-ray lane state for (pixel, sample) ids — identical
        computations to trace_paths' prologue."""
        tables = data.tables
        sp = data.spectral
        pix = (ids % npix).astype(jnp.int32)
        sid = (ids // npix).astype(jnp.int32)
        keys = rng.sample_key(base_key, pix, sid)
        jitter = rng.uniform(keys, rng.D_PIXEL_JITTER, 2)
        u_spec = rng.uniform(keys, rng.D_SPECTRUM, 2)
        e0, _ = sp.sample_emitter(u_spec[:, 0])
        k, _ = sp.sample_k(e0, u_spec[:, 1])
        p_k = sp.joint_spectral_density(k)
        w_spectral = 1.0 / jnp.maximum(p_k, 1e-30)
        pxy = jnp.stack([pix % W, pix // W], axis=-1)
        ro, rd, pixel_tan_alpha = sensor.generate_rays(pxy, jitter)
        M0 = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                              (N, 4, 4)) * sensor.importance()
        sens = sensor.response.sensitivities(k, tables.spectra, None)
        ps = dict(ro=ro, rd=rd, M=M0, xf=_perp_axis(-rd),
                  L=jnp.zeros((N, 4), jnp.float32),
                  active=jnp.ones((N,), bool),
                  exclude=jnp.full((N,), -1, jnp.int32),
                  prev_pdf=jnp.zeros((N,), jnp.float32),
                  prev_specular=jnp.ones((N,), bool))
        if wave:
            # the wave bounce's extra beam state (trace_paths_wave
            # prologue): elliptic envelope + deferred FSD carry
            ps.update(
                env=env_mod.initial(rd, 0.0, 0.5 * pixel_tan_alpha),
                fsd_ap=fsd_mod.empty_aperture(N, K),
                fsd_valid=jnp.zeros((N,), bool),
                sampled_fsd=jnp.zeros((N,), bool),
                prev_vert=ro, M_prev=M0)
        meta = dict(keys=keys, k=k, w_spectral=w_spectral, sens=sens,
                    splat_pos=pxy.astype(jnp.float32) + jitter,
                    depth=jnp.zeros((N,), jnp.int32))
        return ps, meta

    def to_values(ps, meta, N):
        Lw = ps["L"] * meta["w_spectral"][:, None]
        if polarimetric:
            return (Lw[:, None, :]
                    * meta["sens"][..., None]).reshape(N, -1)
        return Lw[:, 0:1] * meta["sens"]

    def init_state(data, film, base_key, id_start, N):
        # start with an empty (all-dead, nothing pending) pool; the first
        # step fills it
        ps0, meta0 = fresh(data, base_key, N, jnp.zeros((N,), jnp.int32))
        ps0["active"] = jnp.zeros((N,), bool)
        ps0["stats"] = jnp.zeros((N_STATS,), jnp.float32)
        return dict(ps=ps0, meta=meta0, film=film,
                    pending=jnp.zeros((N,), bool),
                    next_id=jnp.asarray(id_start, jnp.int32))

    def body(data, base_key, id_end, c, N):
        ps, meta = c["ps"], c["meta"]
        dead = ~ps["active"]
        # 1. splat finished lanes
        film = film_mod.splat(c["film"], meta["splat_pos"],
                              to_values(ps, meta, N),
                              dead & c["pending"])
        pending = c["pending"] & ~dead
        # 2. refill dead lanes with the next ids
        ranks = jnp.cumsum(dead.astype(jnp.int32)) - 1
        new_id = c["next_id"] + ranks
        take = dead & (new_id < id_end)
        f_ps, f_meta = fresh(data, base_key, N, jnp.where(take, new_id, 0))

        def sel(n, o):
            if n.ndim == 0:      # scalar stream constants
                return n
            return jnp.where(
                take.reshape((N,) + (1,) * (n.ndim - 1)), n, o)

        for key_ in f_ps:
            if key_ == "active":
                continue
            ps[key_] = jax.tree.map(sel, f_ps[key_], ps[key_])
        ps["active"] = ps["active"] | take
        meta = jax.tree.map(sel, f_meta, meta)
        pending = pending | take
        next_id = jnp.minimum(
            c["next_id"] + jnp.sum(dead.astype(jnp.int32)),
            jnp.asarray(id_end, jnp.int32))
        # 3. one bounce for the whole pool
        dkeys = rng.depth_key_v(meta["keys"], meta["depth"])
        if wave:
            ps = wave_bounce(data, data.edges, ps, dkeys, meta["k"],
                             meta["depth"], eps=eps, mis=mis,
                             fsd=fsd, K=K, rr_depth=rr_depth,
                             rr_floor=rr_floor,
                             with_stats=with_stats)
        else:
            ps = classical_bounce(data, ps, dkeys, meta["k"],
                                  meta["depth"], eps=eps, mis=mis,
                                  rr_depth=rr_depth,
                                  rr_floor=rr_floor,
                                  with_stats=with_stats)
        meta["depth"] = jnp.where(ps["active"], meta["depth"] + 1,
                                  meta["depth"])
        # depth cap = the batched renderer's max_depth
        ps["active"] = ps["active"] & (meta["depth"] < max_depth)
        return dict(ps=ps, meta=meta, film=film, pending=pending,
                    next_id=next_id)

    def final_splat(c, N):
        return film_mod.splat(c["film"], c["meta"]["splat_pos"],
                              to_values(c["ps"], c["meta"], N),
                              c["pending"])

    return fresh, to_values, init_state, body, final_splat


def make_compact_kernel(sensor, max_depth, eps, mis, *, rr_depth=3,
                        rr_floor=0.5, with_stats=True, wave=False,
                        fsd=True, K=8):
    """Returns a jitted kernel: (data, film, base_key, id_bounds,
    lanes[static]) → (film, stats). Ids enumerate (pixel, sample) pairs
    as id = sid·npixels + pixel. wave=True runs the wave-optical bounce
    (hybrid cone traversal + deferred coherent FSD) in the same
    persistent pool; the whole loop runs in ONE device dispatch."""
    _, _, init_state, body, final_splat = _pool_parts(
        sensor, max_depth, eps, mis, rr_depth, rr_floor, with_stats,
        wave, fsd, K)

    @partial(jax.jit, static_argnums=(4,), donate_argnums=(1,))
    def kern(data, film, base_key, id_bounds, lanes):
        id_start, id_end = id_bounds[0], id_bounds[1]
        N = lanes
        state = init_state(data, film, base_key, id_start, N)

        def cond(c):
            return jnp.any(c["ps"]["active"]) | (c["next_id"] < id_end)

        out = jax.lax.while_loop(
            cond, lambda c: body(data, base_key, id_end, c, N), state)
        # final splat: lanes that died on the last bounce
        film = final_splat(out, N)
        return film, out["ps"]["stats"]

    return kern


def make_stepped_kernel(sensor, max_depth, eps, mis, *, rr_depth=3,
                        rr_floor=0.5, with_stats=True, wave=False,
                        fsd=True, K=8):
    """Host-stepped persistent wavefront: returns (init, step, finish).

    * ``init(data, film, base_key, id_bounds, lanes)`` → state
    * ``step(data, state)`` → state  (jitted, state donated; sets
      state["alive"], a device scalar the host polls)
    * ``finish(state)`` → (film, stats)

    Drive it as::

        c = init(data, film, key, bounds, lanes)
        while True:
            c = step(data, c)
            if not bool(c["alive"]):
                break
        film, stats = finish(c)
    """
    _, _, init_state, body, final_splat = _pool_parts(
        sensor, max_depth, eps, mis, rr_depth, rr_floor, with_stats,
        wave, fsd, K)

    @partial(jax.jit, static_argnums=(4,))
    def init(data, film, base_key, id_bounds, lanes):
        c = init_state(data, film, base_key, id_bounds[0], lanes)
        c["id_end"] = jnp.asarray(id_bounds[1], jnp.int32)
        c["base_key"] = base_key
        c["alive"] = jnp.asarray(True)
        return c

    @partial(jax.jit, donate_argnums=(1,))
    def step(data, c):
        N = c["ps"]["L"].shape[0]
        inner = {k: v for k, v in c.items()
                 if k not in ("id_end", "base_key", "alive")}
        out = body(data, c["base_key"], c["id_end"], inner, N)
        out["id_end"] = c["id_end"]
        out["base_key"] = c["base_key"]
        out["alive"] = jnp.any(out["ps"]["active"]) \
            | (out["next_id"] < c["id_end"])
        return out

    @jax.jit
    def finish(c):
        N = c["ps"]["L"].shape[0]
        inner = {k: v for k, v in c.items()
                 if k not in ("id_end", "base_key", "alive")}
        film = final_splat(inner, N)
        return film, c["ps"]["stats"]

    return init, step, finish
