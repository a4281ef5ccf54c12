"""Deterministic counter-based RNG for wavefront rendering.

The reference uses thread-local MT19937-64 (reference
include/wt/sampler/uniform.hpp:27) and a Sobol GF(3) LDS. On TPU, statefully
mutating generators don't fit the functional model; instead every random draw
is keyed by (base seed, pixel, sample, depth, use) via threefry fold_in —
deterministic per sample, reproducible across shardings and resumable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

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
    """Key for one (pixel, sample) path. Works on batched int32 arrays."""
    k = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(base_key, pixel_id)
    return jax.vmap(jax.random.fold_in)(k, sample_id)


def depth_key(path_key, depth):
    """Sub-key for one bounce; depth is a traced scalar."""
    return jax.vmap(jax.random.fold_in, in_axes=(0, None))(path_key, depth)


def uniform(keys, salt: int, n: int | None = None):
    """U[0,1) draws: one per key, or (N, n) when n given."""
    def draw(k):
        kk = jax.random.fold_in(k, salt)
        if n is None:
            return jax.random.uniform(kk, ())
        return jax.random.uniform(kk, (n,))
    return jax.vmap(draw)(keys)


def uniform2(keys, salt: int):
    return uniform(keys, salt, 2)


def normal(keys, salt: int, n: int | None = None):
    def draw(k):
        kk = jax.random.fold_in(k, salt)
        if n is None:
            return jax.random.normal(kk, ())
        return jax.random.normal(kk, (n,))
    return jax.vmap(draw)(keys)


def make_base_key(seed: int):
    return jax.random.PRNGKey(seed)
