"""Owen-scrambled Sobol sequences — device-side, stateless.

The reference ships a "Quad-Optimized LDS" GF(3) Sobol sampler with data
tables (reference include/wt/sampler/sobolld.hpp:28-80,
data/sobolld/initIrreducibleGF3.dat — a git-lfs stub in this snapshot).
Here: classic base-2 Sobol with Joe–Kuo direction numbers for the first
dimensions plus hash-based Owen scrambling (Laine–Karras style), which
matches the reference sampler's purpose (variance reduction for pixel /
lens / spectral dimensions) with zero data tables — every sample is
computed statelessly from (index, dimension, seed), exactly what a TPU
wavefront wants.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Joe-Kuo primitive polynomials (a) and initial direction numbers (m) for
# dimensions 1..8 (dimension 0 is van der Corput). Public tabulated data.
_JK = [
    # (s, a, [m...])
    (1, 0, [1]),
    (2, 1, [1, 3]),
    (3, 1, [1, 3, 1]),
    (3, 2, [1, 1, 1]),
    (4, 1, [1, 1, 3, 3]),
    (4, 4, [1, 3, 5, 13]),
    (5, 2, [1, 1, 5, 5, 17]),
    (5, 4, [1, 1, 5, 5, 5]),
]

N_DIMS = len(_JK) + 1
_BITS = 32


def _direction_matrices() -> np.ndarray:
    """(N_DIMS, 32) uint32 direction numbers."""
    V = np.zeros((N_DIMS, _BITS), np.uint64)
    # dim 0: van der Corput
    for i in range(_BITS):
        V[0, i] = np.uint64(1) << np.uint64(31 - i)
    for d, (s, a, m_init) in enumerate(_JK, start=1):
        m = list(m_init)
        for i in range(s, _BITS):
            mi = m[i - s] ^ (m[i - s] << s)
            for k in range(1, s):
                if (a >> (s - 1 - k)) & 1:
                    mi ^= m[i - k] << k
            m.append(mi)
        for i in range(_BITS):
            V[d, i] = np.uint64(m[i]) << np.uint64(31 - i)
    return V.astype(np.uint32)


_V = jnp.asarray(_direction_matrices())


def sobol_raw(index, dim):
    """Unscrambled Sobol sample bits: index (...,) i32/u32, dim static or
    (...,) i32 → uint32."""
    idx = index.astype(jnp.uint32)
    if isinstance(dim, int) and dim == 0:
        return _reverse_bits(idx)        # van der Corput = bit reversal
    out = jnp.zeros_like(idx)
    if isinstance(dim, int):
        Vn = _direction_matrices()[dim]  # fold the constants at trace time
        for b in range(_BITS):
            bit = (idx >> np.uint32(b)) & np.uint32(1)
            out = out ^ (bit * np.uint32(Vn[b]))
        return out
    for b in range(_BITS):
        bit = (idx >> np.uint32(b)) & np.uint32(1)
        out = out ^ (bit * _V[dim, b])
    return out


def _hash(x):
    x = x.astype(jnp.uint32)
    x ^= x >> np.uint32(16)
    x *= np.uint32(0x7FEB352D)
    x ^= x >> np.uint32(15)
    x *= np.uint32(0x846CA68B)
    x ^= x >> np.uint32(16)
    return x


def _owen_scramble(bits, seed):
    """Laine–Karras style hash-based Owen scrambling of reversed bits."""
    v = _reverse_bits(bits)
    v = v + seed
    v ^= v * np.uint32(0x6C50B47C)
    v ^= v * np.uint32(0xB82F1E52)
    v ^= v * np.uint32(0xC7AFE638)
    v ^= v * np.uint32(0x8D22F6E6)
    return _reverse_bits(v)


def _reverse_bits(x):
    x = ((x & np.uint32(0x55555555)) << np.uint32(1)) \
        | ((x >> np.uint32(1)) & np.uint32(0x55555555))
    x = ((x & np.uint32(0x33333333)) << np.uint32(2)) \
        | ((x >> np.uint32(2)) & np.uint32(0x33333333))
    x = ((x & np.uint32(0x0F0F0F0F)) << np.uint32(4)) \
        | ((x >> np.uint32(4)) & np.uint32(0x0F0F0F0F))
    x = ((x & np.uint32(0x00FF00FF)) << np.uint32(8)) \
        | ((x >> np.uint32(8)) & np.uint32(0x00FF00FF))
    return (x << np.uint32(16)) | (x >> np.uint32(16))


def sample(index, dim: int, seed):
    """Owen-scrambled Sobol u ∈ [0,1): index (...,) sample index, dim a
    static dimension < N_DIMS, seed (...,) u32 decorrelation stream (e.g.
    hashed pixel id)."""
    # scramble the index ordering per seed stream too (pad with hash)
    bits = sobol_raw(index, dim % N_DIMS)
    seed = _hash(seed.astype(jnp.uint32)
                 + np.uint32(dim) * np.uint32(0x9E3779B9))
    s = _owen_scramble(bits, seed)
    return s.astype(jnp.float32) * (1.0 / 4294967296.0)


def sample2(index, dim_pair: int, seed):
    """A (u1, u2) pair from consecutive dimensions."""
    u1 = sample(index, 2 * dim_pair, seed)
    u2 = sample(index, 2 * dim_pair + 1, seed)
    return jnp.stack([u1, u2], axis=-1)
