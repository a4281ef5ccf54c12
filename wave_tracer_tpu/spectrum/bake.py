"""Device-side spectral tables.

Host `Spectrum` objects are baked at scene-build time into flat arrays that
jit kernels evaluate with one gather + lerp: each spectrum gets a log-spaced
wavenumber grid over its own support. Complex IOR spectra bake to (n, κ)
pairs the same way. This replaces the reference's virtual
`spectrum_t::value(k)` dispatch (reference include/wt/spectrum/spectrum.hpp)
with a branch-free table lookup.

Also provides device evaluation of response sensitivities (CIE CMFs, Smits
RGB uplift) as pure elementwise jnp math.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from wave_tracer_tpu.spectrum import cie
from wave_tracer_tpu.spectrum.spectra import (
    ComplexSpectrum, Spectrum, _SMITS, _SMITS_LAM, TWO_PI)

K_RES = 192   # grid points per baked spectrum


@struct.dataclass
class SpectrumTable:
    """Baked real spectra: row s covers [kmin[s], kmax[s]] log-spaced.

    `pairs` holds (v[i], v[i+1]) per cell and `bounds` the log range so
    an eval costs TWO gathers (gathers carry a large fixed cost on this
    backend; see accel/trace.py GeoArrays)."""
    vals: jnp.ndarray      # (S, K_RES) f32 density values
    log_kmin: jnp.ndarray  # (S,)
    log_kmax: jnp.ndarray  # (S,)

    def eval(self, sid, k):
        """Density of spectrum sid (...,) i32 at wavenumber k (...,)."""
        # derive the packed pair/bounds views on the fly: fused once per
        # kernel, keeps eval at TWO gathers AND differentiable w.r.t. vals
        pairs = jnp.stack([self.vals, jnp.concatenate(
            [self.vals[:, 1:], self.vals[:, -1:]], axis=1)], axis=-1)
        bounds = jnp.stack([self.log_kmin, self.log_kmax], axis=-1)
        sid = jnp.maximum(sid, 0)
        lk = jnp.log(jnp.maximum(k, 1e-30))
        b = bounds[sid]
        lo = b[..., 0]
        hi = b[..., 1]
        t = (lk - lo) / jnp.maximum(hi - lo, 1e-12) * (K_RES - 1)
        inside = (t >= 0.0) & (t <= K_RES - 1.0)
        t = jnp.clip(t, 0.0, K_RES - 1.0)
        i0 = jnp.clip(t.astype(jnp.int32), 0, K_RES - 2)
        frac = t - i0.astype(t.dtype)
        vp = pairs[sid, i0]
        return jnp.where(inside,
                         vp[..., 0] * (1.0 - frac) + vp[..., 1] * frac,
                         0.0)


@struct.dataclass
class ComplexSpectrumTable:
    """Baked complex IOR spectra η(k) = n + iκ. `quads` packs
    (n[i], n[i+1], κ[i], κ[i+1]) so an eval costs TWO gathers."""
    n: jnp.ndarray         # (C, K_RES)
    kappa: jnp.ndarray     # (C, K_RES)
    log_kmin: jnp.ndarray
    log_kmax: jnp.ndarray

    def eval(self, cid, k):
        quads = jnp.stack([
            self.n, jnp.concatenate([self.n[:, 1:], self.n[:, -1:]], 1),
            self.kappa,
            jnp.concatenate([self.kappa[:, 1:], self.kappa[:, -1:]], 1)],
            axis=-1)
        bounds = jnp.stack([self.log_kmin, self.log_kmax], axis=-1)
        cid = jnp.maximum(cid, 0)
        lk = jnp.log(jnp.maximum(k, 1e-30))
        b = bounds[cid]
        lo = b[..., 0]
        hi = b[..., 1]
        t = jnp.clip((lk - lo) / jnp.maximum(hi - lo, 1e-12) * (K_RES - 1),
                     0.0, K_RES - 1.0)
        i0 = jnp.clip(t.astype(jnp.int32), 0, K_RES - 2)
        frac = (t - i0.astype(t.dtype))
        q = quads[cid, i0]
        n = q[..., 0] * (1 - frac) + q[..., 1] * frac
        kap = q[..., 2] * (1 - frac) + q[..., 3] * frac
        return n + 1j * kap.astype(jnp.complex64)


def bake_spectra(specs: list[Spectrum]) -> SpectrumTable:
    S = max(len(specs), 1)
    vals = np.zeros((S, K_RES), np.float32)
    lo = np.zeros(S, np.float32)
    hi = np.ones(S, np.float32)
    for i, s in enumerate(specs):
        kmin, kmax = s.krange()
        kmin = max(kmin, 1e-9)
        kmax = max(kmax, kmin * (1 + 1e-6))
        if s.is_discrete:
            # deposit line WEIGHTS (not densities) so that eval at a
            # sampled line returns w_i — paired with pmf-measure sampling
            # the discrete measures cancel exactly (the reference's
            # density-measure discipline, sampler/density.hpp)
            kmin = kmin * (1.0 - 1e-3)
            kmax = kmax * (1.0 + 1e-3)
            grid = np.geomspace(kmin, kmax, K_RES)
            ks, ws = s.lines()
            row = np.zeros(K_RES)
            for kl, wl in zip(ks, ws):
                j = np.searchsorted(grid, kl)
                row[max(j - 1, 0)] = max(row[max(j - 1, 0)], wl)
                row[min(j, K_RES - 1)] = max(row[min(j, K_RES - 1)], wl)
            vals[i] = row
        else:
            grid = np.geomspace(kmin, kmax, K_RES)
            vals[i] = s.eval(grid)
        lo[i] = np.log(kmin)
        hi[i] = np.log(kmax)
    return SpectrumTable(vals=jnp.asarray(vals), log_kmin=jnp.asarray(lo),
                         log_kmax=jnp.asarray(hi))


def bake_complex(specs: list[ComplexSpectrum],
                 k_hint: tuple[float, float] = (1.0, 3e7)
                 ) -> ComplexSpectrumTable:
    C = max(len(specs), 1)
    n = np.ones((C, K_RES), np.float32)
    kap = np.zeros((C, K_RES), np.float32)
    lo = np.zeros(C, np.float32)
    hi = np.ones(C, np.float32)
    for i, s in enumerate(specs):
        kmin, kmax = k_hint
        if hasattr(s, "k_nodes"):
            kmin, kmax = float(s.k_nodes[0]), float(s.k_nodes[-1])
        kmin = max(kmin, 1e-9)
        grid = np.geomspace(kmin, kmax, K_RES)
        eta = s.eval(grid)
        n[i] = np.real(eta)
        kap[i] = np.imag(eta)
        lo[i] = np.log(kmin)
        hi[i] = np.log(kmax)
    return ComplexSpectrumTable(n=jnp.asarray(n), kappa=jnp.asarray(kap),
                                log_kmin=jnp.asarray(lo),
                                log_kmax=jnp.asarray(hi))


# --- device Smits uplift -----------------------------------------------------

_SMITS_DEV = jnp.asarray(np.stack([
    _SMITS["white"], _SMITS["cyan"], _SMITS["magenta"], _SMITS["yellow"],
    _SMITS["red"], _SMITS["green"], _SMITS["blue"]]), jnp.float32)


def smits_uplift_dev(rgb, k):
    """Device RGB→spectral uplift; rgb (..., 3), k (...,) → (...,).

    Same Smits-basis decomposition as spectra.smits_uplift, branchless.
    """
    lam_nm = TWO_PI / jnp.maximum(k, 1e-30) * 1e9
    lo, hi = _SMITS_LAM
    b = jnp.clip(((lam_nm - lo) / (hi - lo) * 10).astype(jnp.int32), 0, 9)
    inside = (lam_nm >= lo) & (lam_nm <= hi)
    basis = _SMITS_DEV[:, b]                       # (7, ...)
    white, cyan, magenta, yellow, red, green, blue = basis
    r, g, bl = rgb[..., 0], rgb[..., 1], rgb[..., 2]

    # case r smallest
    out_r = white * r + jnp.where(g <= bl,
                                  cyan * (g - r) + blue * (bl - g),
                                  cyan * (bl - r) + green * (g - bl))
    # case g smallest
    out_g = white * g + jnp.where(r <= bl,
                                  magenta * (r - g) + blue * (bl - r),
                                  magenta * (bl - g) + red * (r - bl))
    # case b smallest
    out_b = white * bl + jnp.where(r <= g,
                                   yellow * (r - bl) + green * (g - r),
                                   yellow * (g - bl) + red * (r - g))
    r_min = (r <= g) & (r <= bl)
    g_min = jnp.logical_not(r_min) & (g <= r) & (g <= bl)
    out = jnp.where(r_min, out_r, jnp.where(g_min, out_g, out_b))
    return jnp.where(inside, out, 0.0)


def xyz_response_dev(k):
    """CIE CMF sensitivities at wavenumber k → (..., 3)."""
    lam_nm = TWO_PI / jnp.maximum(k, 1e-30) * 1e9
    x, y, z = cie.xyz_cmf(lam_nm, xp=jnp)
    return jnp.stack([x, y, z], axis=-1)
