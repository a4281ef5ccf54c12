"""Special functions for wave optics: Faddeeva w(z), complex erfc, Fresnel.

The reference links libcerf for the UTD transition function
(reference include/wt/interaction/fsd/utd.hpp:16 `cerfc`). On TPU we need a
branch-free, vectorizable implementation: Weideman's rational approximation
(J.A.C. Weideman, "Computation of the Complex Error Function", SIAM J.
Numer. Anal. 31 (1994) 1497-1518) — a single fixed-degree polynomial in the
Möbius-transformed variable, accurate to ~1e-10 at N=32 over the upper half
plane, pure fused multiply-adds.

Conventions: w(z) = e^{-z²} erfc(-iz); erfc(z) = e^{-z²} w(iz).
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

_N = 32


def _weideman_coeffs(N: int = _N):
    """Polynomial coefficients of the Weideman expansion (host, once);
    transcription of the method in the paper (§Matlab code)."""
    M = 2 * N
    M2 = 2 * M
    L = math.sqrt(N / math.sqrt(2.0))
    k = np.arange(-M + 1, M)
    theta = k * math.pi / M
    t = L * np.tan(theta / 2.0)
    f = np.exp(-t * t) * (L * L + t * t)
    f = np.concatenate([[0.0], f])
    a = np.fft.fft(np.fft.fftshift(f)).real / M2
    a = np.flipud(a[1:N + 1])
    return L, a


_L, _A = _weideman_coeffs()


def faddeeva(z):
    """w(z) for Im(z) ≥ 0 (Weideman 1994). complex64/128 in and out."""
    L = _L
    iz = 1j * z
    Zm = (L + iz) / (L - iz)
    # polynomial in Zm (Horner)
    p = jnp.zeros_like(z)
    for ak in np.asarray(_A):
        p = p * Zm + ak
    denom = (L - iz)
    return 2.0 * p / (denom * denom) \
        + (1.0 / math.sqrt(math.pi)) / denom


def faddeeva_any(z):
    """w(z) on the full plane using w(-z) = 2e^{-z²} − w(z)̄ symmetry
    (w(z̄) = conj(w(-z)))."""
    upper = jnp.imag(z) >= 0
    zu = jnp.where(upper, z, -z)
    wu = faddeeva(zu)
    # for Im z < 0: w(z) = 2 exp(-z²) - w(-z)
    wl = 2.0 * jnp.exp(-(z * z)) - wu
    return jnp.where(upper, wu, wl)


def erfc_complex(z):
    """erfc(z) = e^{-z²} w(iz)."""
    return jnp.exp(-(z * z)) * faddeeva_any(1j * z)


def erf_complex(z):
    return 1.0 - erfc_complex(z)


def fresnel_cs(t):
    """Fresnel integrals C(t), S(t) = ∫₀ᵗ cos/sin(π u²/2) du, real t.

    Via the Faddeeva function: C+iS = (1+i)/2 · erf(√π/2 (1−i) t).
    """
    t = jnp.asarray(t)
    zc = (math.sqrt(math.pi) / 2.0) * (1.0 - 1.0j) * t.astype(jnp.complex64)
    e = erf_complex(zc)
    cs = (1.0 + 1.0j) / 2.0 * e
    return jnp.real(cs), jnp.imag(cs)


def utd_transition(x):
    """The UTD transition function F(x) for x ≥ 0 (reference utd.hpp:35-57).

    F(x) = (1+i)·√(π/2)·√x·e^{ix}·erfc(e^{iπ/4}√x). Using
    erfc(z) = e^{-z²}w(iz) with z² = ix, the oscillatory e^{ix} cancels:
    F(x) = (1+i)·√(π/2)·√x·w(√x·e^{i3π/4}) — numerically stable for any x,
    with F(x) → 1 as x → ∞. Negative x returns conj(F(|x|)) like the
    reference.
    """
    ax = jnp.abs(x)
    sq = jnp.sqrt(ax)
    zrot = sq.astype(jnp.complex64) \
        * jnp.asarray(np.exp(3j * np.pi / 4), jnp.complex64)
    F = (1.0 + 1.0j) * math.sqrt(math.pi / 2.0) * sq * faddeeva(zrot)
    return jnp.where(x < 0, jnp.conj(F), F)
