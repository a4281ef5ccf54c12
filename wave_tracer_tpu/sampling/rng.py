"""Deterministic counter-based sampling for wavefront rendering.

The reference's default scene sampler is the quad-optimized Sobol LDS
(reference include/wt/sampler/sobolld.hpp:28-80) with thread-local
MT19937-64 as the uniform fallback (include/wt/sampler/uniform.hpp:27).
On TPU, statefully mutating generators don't fit the functional model;
instead every draw is a pure function of (base seed, pixel, sample,
depth, use):

* default ("sobol"): padded Owen-scrambled base-2 Sobol — each logical
  (u1, u2) pair comes from dimensions (0, 1) of the sequence at
  index=sample_id, decorrelated per (pixel, depth, use) by Laine-Karras
  hash-based Owen scrambling (sampling/sobol.py). Every 2D projection the
  integrator consumes (pixel jitter, BSDF direction, NEE, spectrum) is a
  stratified (0,1)-sequence — the same variance-reduction role as the
  reference's sobolld, with zero data tables.
* "uniform" (WT_SAMPLER=uniform): threefry fold_in chains — the plain
  counter-based fallback.

Both are deterministic per (pixel, sample), reproducible across shardings
and resumable.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from wave_tracer_tpu.sampling import sobol

_SAMPLER = os.environ.get("WT_SAMPLER", "sobol")

# Dimension salts: one namespace per consumer so streams never collide.
D_PIXEL_JITTER = 0
D_LENS = 1
D_SPECTRUM = 2
D_EMITTER_PICK = 3
D_EMITTER_POS = 4
D_EMITTER_DIR = 5
D_BSDF_LOBE = 6
D_BSDF_DIR = 7
D_NEE = 8
D_RR = 9
D_FSD = 10
D_SENSOR = 11
D_PHASE = 12


def sample_key(base_key, pixel_id, sample_id):
    """Sampling stream for one (pixel, sample) path — a dict pytree
    carrying both the threefry chain and the LDS coordinates."""
    k = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(base_key, pixel_id)
    k = jax.vmap(jax.random.fold_in)(k, sample_id)
    raw = jax.random.key_data(base_key).reshape(-1)
    strm = sobol._hash(pixel_id.astype(jnp.uint32)
                       ^ raw[-1].astype(jnp.uint32))
    return {"key": k, "idx": sample_id.astype(jnp.uint32), "strm": strm,
            "d": jnp.uint32(0)}


def depth_key(stream, depth):
    """Sub-stream for one bounce; depth is a traced scalar."""
    k = jax.vmap(jax.random.fold_in, in_axes=(0, None))(stream["key"],
                                                        depth)
    d = jnp.asarray(depth).astype(jnp.uint32)
    return {"key": k, "idx": stream["idx"], "strm": stream["strm"],
            "d": d}


def depth_key_v(stream, depth):
    """depth_key with a PER-LANE depth vector (compacted wavefronts where
    each lane sits at its own bounce). Identical streams to depth_key for
    equal depth values."""
    k = jax.vmap(jax.random.fold_in)(stream["key"],
                                     depth.astype(jnp.uint32))
    return {"key": k, "idx": stream["idx"], "strm": stream["strm"],
            "d": depth.astype(jnp.uint32)}


def _threefry_uniform(keys, salt: int, n: int | None):
    def draw(k):
        kk = jax.random.fold_in(k, salt)
        if n is None:
            return jax.random.uniform(kk, ())
        return jax.random.uniform(kk, (n,))
    return jax.vmap(draw)(keys)


def uniform(stream, salt: int, n: int | None = None):
    """U[0,1) draws: one per lane, or (N, n) when n given.

    Sobol mode: component pairs (2i, 2i+1) are dims (0, 1) of the
    Owen-scrambled sequence at index=sample_id, scramble stream
    hash(pixel, depth, salt, i) — every consumed 2D projection is a
    stratified (0,1)-sequence over the pixel's samples.
    """
    if not isinstance(stream, dict):            # legacy raw-keys call
        return _threefry_uniform(stream, salt, n)
    if _SAMPLER != "sobol":
        return _threefry_uniform(stream["key"], salt, n)
    nn = 1 if n is None else n
    seed0 = stream["strm"] ^ (stream["d"] * jnp.uint32(0x9E3779B9)
                              + jnp.uint32(salt) * jnp.uint32(0x85EBCA6B))
    cols = []
    for i in range(nn):
        seed = seed0 + jnp.uint32(i // 2) * jnp.uint32(0xC2B2AE35)
        cols.append(sobol.sample(stream["idx"], i % 2, seed))
    if n is None:
        return cols[0]
    return jnp.stack(cols, axis=-1)


def uniform2(stream, salt: int):
    return uniform(stream, salt, 2)


def normal(stream, salt: int, n: int | None = None):
    keys = stream["key"] if isinstance(stream, dict) else stream

    def draw(k):
        kk = jax.random.fold_in(k, salt)
        if n is None:
            return jax.random.normal(kk, ())
        return jax.random.normal(kk, (n,))
    return jax.vmap(draw)(keys)


def make_base_key(seed: int):
    return jax.random.PRNGKey(seed)
