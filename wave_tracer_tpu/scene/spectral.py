"""Per-sensor spectral importance sampling: emitter × sensitivity products.

The reference's scene_sensor_t builds, per sensor, (a) a discrete
emitter-power distribution and (b) per-emitter product distributions
emitterSpectrum × sensorSensitivity, then samples (emitter, wavenumber)
jointly and applies spectral MIS over emitters
(reference include/wt/scene/scene_sensor.hpp:31-142,
src/scene/scene_build_sensor_sampling_data.cpp,
plt_path_detail.hpp:772-780).

Device representation: stacked per-emitter piecewise-linear product tables
(continuous emitters) and line tables (discrete emitters), sampled with a
fixed-step binary search so no (N × K) intermediates materialize.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from wave_tracer_tpu.spectrum.spectra import Spectrum

KP = 256        # product-distribution resolution
LMAX = 16       # max spectral lines per discrete emitter


@struct.dataclass
class SpectralSampler:
    e_w: jnp.ndarray        # (E,) emitter selection weights
    e_cdf: jnp.ndarray      # (E,) inclusive CDF (normalized)
    x: jnp.ndarray          # (E, KP) wavenumber nodes
    f: jnp.ndarray          # (E, KP) product density
    cdf: jnp.ndarray        # (E, KP) cumulative (unnormalized), cdf[...,0]=0
    total: jnp.ndarray      # (E,)
    line_k: jnp.ndarray     # (E, LMAX)
    line_w: jnp.ndarray     # (E, LMAX) product-weighted line powers
    n_lines: jnp.ndarray    # (E,) i32 (0 → continuous emitter)

    @property
    def count(self):
        return self.e_w.shape[0]

    # -- emitter selection ------------------------------------------------
    def sample_emitter(self, u):
        """u (N,) → (e (N,) i32, pmf (N,))."""
        E = self.count
        target = u
        idx = jnp.searchsorted(self.e_cdf, target, side="right")
        e = jnp.clip(idx, 0, E - 1).astype(jnp.int32)
        return e, self.pmf_emitter(e)

    def pmf_emitter(self, e):
        tot = self.e_w.sum()
        return self.e_w[e] / jnp.maximum(tot, 1e-30)

    # -- wavenumber sampling ----------------------------------------------
    def sample_k(self, e, u):
        """Sample k from emitter e's product distribution.

        Returns (k, pdf_k) — pdf is the *continuous* density, or the line
        pmf for discrete emitters (measure bookkeeping as in the
        reference's density types)."""
        disc = self.n_lines[e] > 0
        # discrete: inverse CDF over ≤ LMAX lines
        lw = self.line_w[e]                       # (N, LMAX)
        lcdf = jnp.cumsum(lw, axis=-1)
        ltot = jnp.maximum(lcdf[..., -1], 1e-30)
        t = (u * ltot)[..., None]
        li = jnp.sum((lcdf < t).astype(jnp.int32), axis=-1)
        li = jnp.clip(li, 0, LMAX - 1)
        k_d = jnp.take_along_axis(self.line_k[e], li[..., None],
                                  axis=-1)[..., 0]
        pmf_d = jnp.take_along_axis(lw, li[..., None], axis=-1)[..., 0] / ltot

        # continuous: binary search on cdf row
        tot = jnp.maximum(self.total[e], 1e-30)
        target = u * tot
        lo = jnp.zeros_like(e)
        hi = jnp.full_like(e, KP - 2)
        for _ in range(9):     # 2^9 > KP
            mid = (lo + hi + 1) // 2
            cv = self.cdf[e, mid]
            go = cv <= target
            lo = jnp.where(go, mid, lo)
            hi = jnp.where(go, hi, mid - 1)
        i = jnp.clip(lo, 0, KP - 2)
        x0 = self.x[e, i]
        x1 = self.x[e, i + 1]
        f0 = self.f[e, i]
        f1 = self.f[e, i + 1]
        c0 = self.cdf[e, i]
        dx = jnp.maximum(x1 - x0, 1e-12)
        r = jnp.maximum(target - c0, 0.0)
        df = (f1 - f0) / dx
        lin = r / jnp.maximum(f0, 1e-20)
        disc2 = jnp.maximum(f0 * f0 + 2.0 * df * r, 0.0)
        quad = (jnp.sqrt(disc2) - f0) / jnp.where(jnp.abs(df) < 1e-20, 1.0,
                                                  df)
        tseg = jnp.clip(jnp.where(jnp.abs(df) < 1e-20, lin, quad), 0.0, dx)
        k_c = x0 + tseg
        pdf_c = (f0 + df * tseg) / tot

        k = jnp.where(disc, k_d, k_c)
        pdf = jnp.where(disc, pmf_d, pdf_c)
        return k, pdf

    def pdf_k(self, e, k):
        """Continuous product density of emitter e at k (0 for discrete)."""
        # per-row interp via binary search
        lo = jnp.zeros_like(e)
        hi = jnp.full_like(e, KP - 2)
        for _ in range(9):
            mid = (lo + hi + 1) // 2
            xv = self.x[e, mid]
            go = xv <= k
            lo = jnp.where(go, mid, lo)
            hi = jnp.where(go, hi, mid - 1)
        i = jnp.clip(lo, 0, KP - 2)
        x0 = self.x[e, i]
        x1 = self.x[e, i + 1]
        f0 = self.f[e, i]
        f1 = self.f[e, i + 1]
        t = jnp.clip((k - x0) / jnp.maximum(x1 - x0, 1e-12), 0.0, 1.0)
        val = f0 + (f1 - f0) * t
        inside = (k >= self.x[e, 0]) & (k <= self.x[e, KP - 1])
        pdf = jnp.where(inside, val / jnp.maximum(self.total[e], 1e-30), 0.0)
        return jnp.where(self.n_lines[e] > 0, 0.0, pdf)

    def joint_spectral_density(self, k):
        """Σ_e pmf(e) · pdf_e(k) over continuous emitters, plus matching
        discrete lines — the spectral-MIS denominator
        (plt_path_detail.hpp:772-780). k (N,) → (N,)."""
        tot_w = jnp.maximum(self.e_w.sum(), 1e-30)
        E = self.count
        acc = jnp.zeros_like(k)
        for e_static in range(E):
            e = jnp.full(k.shape, e_static, jnp.int32)
            pmf_e = self.e_w[e_static] / tot_w
            cont = self.pdf_k(e, k)
            # discrete: match lines within relative tolerance
            lk = self.line_k[e_static]              # (LMAX,)
            lw = self.line_w[e_static]
            ltot = jnp.maximum(lw.sum(), 1e-30)
            match = jnp.abs(k[..., None] - lk[None, :]) \
                < 1e-5 * jnp.maximum(k[..., None], 1.0)
            pmf_line = jnp.sum(jnp.where(match, lw[None, :], 0.0),
                               axis=-1) / ltot
            has_lines = self.n_lines[e_static] > 0
            acc = acc + pmf_e * jnp.where(has_lines, pmf_line, cont)
        return acc


def build_spectral_sampler(emitters, sensitivity: Spectrum
                           ) -> SpectralSampler:
    """Host build of the per-sensor product tables."""
    E = max(len(emitters), 1)
    e_w = np.zeros(E, np.float64)
    x = np.tile(np.linspace(1.0, 2.0, KP), (E, 1))
    f = np.zeros((E, KP), np.float64)
    cdf = np.zeros((E, KP), np.float64)
    total = np.zeros(E, np.float64)
    line_k = np.zeros((E, LMAX), np.float64)
    line_w = np.zeros((E, LMAX), np.float64)
    n_lines = np.zeros(E, np.int32)

    s_lo, s_hi = sensitivity.krange()
    sens_discrete = getattr(sensitivity, "is_discrete", False)
    for i, em in enumerate(emitters):
        spec = em.spectrum
        if sens_discrete and not spec.is_discrete:
            # line sensitivity × continuous emitter → lines at the
            # sensitivity's wavenumbers weighted by the emitter density
            sk, sw = sensitivity.lines()
            w = np.asarray(spec.eval(sk)) * sw
            n = min(len(sk), LMAX)
            line_k[i, :n] = sk[:n]
            line_w[i, :n] = np.maximum(w[:n], 0.0)
            n_lines[i] = n
            e_w[i] = max(line_w[i, :n].sum(), 1e-30)
            continue
        if spec.is_discrete:
            ks, ws = spec.lines()
            sens = sensitivity.eval(ks)
            # keep lines even when outside sensitivity (monochromatic
            # discrete responses accept exactly these lines)
            w = ws * np.where(sens > 0, sens, 1.0)
            n = min(len(ks), LMAX)
            line_k[i, :n] = ks[:n]
            line_w[i, :n] = np.maximum(w[:n], 1e-30)
            n_lines[i] = n
            e_w[i] = line_w[i, :n].sum()
        else:
            e_lo, e_hi = spec.krange()
            lo = max(e_lo, s_lo)
            hi = min(e_hi, s_hi)
            if hi <= lo:
                lo, hi = e_lo, e_hi     # fall back to emitter support
            grid = np.geomspace(max(lo, 1e-9), hi, KP)
            prod = np.maximum(spec.eval(grid) * sensitivity.eval(grid), 0.0)
            if prod.max() <= 0:
                prod = np.maximum(spec.eval(grid), 0.0)
            x[i] = grid
            f[i] = prod
            seg = 0.5 * (prod[1:] + prod[:-1]) * np.diff(grid)
            cdf[i, 1:] = np.cumsum(seg)
            total[i] = cdf[i, -1]
            e_w[i] = max(total[i], 1e-30)

    e_cdf = np.cumsum(e_w)
    e_cdf = e_cdf / max(e_cdf[-1], 1e-30)
    return SpectralSampler(
        e_w=jnp.asarray(e_w, jnp.float32),
        e_cdf=jnp.asarray(e_cdf, jnp.float32),
        x=jnp.asarray(x, jnp.float32), f=jnp.asarray(f, jnp.float32),
        cdf=jnp.asarray(cdf, jnp.float32),
        total=jnp.asarray(total, jnp.float32),
        line_k=jnp.asarray(line_k, jnp.float32),
        line_w=jnp.asarray(line_w, jnp.float32),
        n_lines=jnp.asarray(n_lines))
