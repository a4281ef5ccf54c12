"""Sensor spectral responses: RGB / XYZ / monochromatic / multichannel.

Reference: include/wt/sensor/response/ (RGB.cpp, XYZ.cpp, monochromatic.cpp,
multichannel.cpp). A response maps a path's wavenumber to per-channel
sensitivities; RGB responses accumulate in XYZ (CIE CMFs evaluated
analytically on device) and convert to the target RGB colourspace at develop
time. The response also provides the total sensitivity spectrum used for
spectral importance sampling products (reference scene_sensor.hpp:31-142).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax.numpy as jnp

from wave_tracer_tpu.spectrum import cie
from wave_tracer_tpu.spectrum.bake import xyz_response_dev
from wave_tracer_tpu.spectrum.spectra import (
    K_VISIBLE_MAX, K_VISIBLE_MIN, Spectrum, UniformSpectrum)


@dataclass
class Response:
    """type: 'RGB' | 'XYZ' | 'monochromatic' | 'multichannel'."""
    type: str = "RGB"
    colourspace: str = "sRGB"
    white_point: str = "D65"
    spectrum: Optional[Spectrum] = None        # monochromatic sensitivity
    channel_spectra: list = field(default_factory=list)  # multichannel
    tonemap: object = None                     # sensor.tonemap.Tonemap

    @property
    def channels(self) -> int:
        if self.type in ("RGB", "XYZ"):
            return 3
        if self.type == "multichannel":
            return max(len(self.channel_spectra), 1)
        return 1

    # ---- host-side -------------------------------------------------------
    def sensitivity_spectrum(self) -> Spectrum:
        """Total (channel-summed) sensitivity for importance sampling."""
        if self.type in ("RGB", "XYZ"):
            return _CMFSumSpectrum()
        if self.type == "monochromatic":
            return self.spectrum if self.spectrum is not None \
                else UniformSpectrum(1.0, K_VISIBLE_MIN, K_VISIBLE_MAX)
        if self.type == "multichannel":
            return _SumSpectrum(self.channel_spectra)
        raise ValueError(self.type)

    def develop_matrix(self) -> Optional[np.ndarray]:
        """Channel mixing applied at develop (XYZ→RGB), or None."""
        if self.type == "RGB":
            return cie.xyz_to_rgb_matrix(self.colourspace, self.white_point)
        return None

    # ---- device-side -----------------------------------------------------
    def sensitivities(self, k, spec_table=None, spec_rows=None):
        """Per-channel sensitivity at wavenumber k (...,) → (..., C).

        For monochromatic/multichannel responses the (baked) sensitivity
        spectra are looked up through spec_table with rows spec_rows; a
        discrete monochromatic sensitivity accepts every path (the spectral
        sampler only ever proposes its lines)."""
        if self.type in ("RGB", "XYZ"):
            return xyz_response_dev(k)
        if self.type == "monochromatic":
            if self.spectrum is None or self.spectrum.is_discrete \
                    or spec_table is None:
                return jnp.ones(k.shape + (1,), jnp.float32)
            return spec_table.eval(spec_rows[0], k)[..., None]
        if self.type == "multichannel":
            if spec_table is None:
                return jnp.ones(k.shape + (self.channels,), jnp.float32)
            cols = [spec_table.eval(r, k) for r in spec_rows]
            return jnp.stack(cols, axis=-1)
        raise ValueError(self.type)


class _CMFSumSpectrum(Spectrum):
    """x̄+ȳ+z̄ as a host spectrum (sampling product with emitter spectra)."""

    def eval(self, k):
        lam_nm = 2.0 * np.pi / np.asarray(k) * 1e9
        x, y, z = cie.xyz_cmf(lam_nm)
        return x + y + z

    def krange(self):
        return (2 * np.pi / (cie.LAMBDA_MAX_NM * 1e-9),
                2 * np.pi / (cie.LAMBDA_MIN_NM * 1e-9))


class _SumSpectrum(Spectrum):
    def __init__(self, spectra):
        self.spectra = spectra

    def eval(self, k):
        out = np.zeros_like(np.asarray(k, np.float64))
        for s in self.spectra:
            out = out + s.eval(k)
        return out

    def krange(self):
        los, his = zip(*[s.krange() for s in self.spectra])
        return (min(los), max(his))
