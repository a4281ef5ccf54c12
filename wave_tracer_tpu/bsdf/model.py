"""Host-side material model (flattened BSDF trees).

The reference nests BSDF wrappers (twosided, mask, normalmap, scale,
composite — reference include/wt/bsdf/). For the device table those trees
are flattened: a `Material` is a base lobe (diffuse / dielectric /
surface_spm) plus wrapper attributes, and composite materials reference
child material rows by wavenumber band.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from wave_tracer_tpu.spectrum.spectra import ComplexSpectrum, Spectrum
from wave_tracer_tpu.texture.texture import Texture


@dataclass
class SurfaceProfile:
    """dirac | gaussian | fractal (reference include/wt/interaction/
    surface_profile/). Roughness optionally textured; direct (T, σh)
    parameterization supported for gaussian σ and fractal T."""
    type: str = "dirac"
    gamma: float = 3.0
    roughness: Optional[Texture] = None   # perceptual roughness texture
    T: Optional[float] = None             # mm² (fractal direct param)
    sigma: Optional[float] = None         # 1/mm (gaussian σ / fractal σ_h)


@dataclass
class DiffuseBSDF:
    reflectance: Texture = None


@dataclass
class DielectricBSDF:
    ior: ComplexSpectrum = None            # material η(k)
    ext_ior: Optional[ComplexSpectrum] = None
    reflection_scale: Optional[Spectrum] = None
    transmission_scale: Optional[Spectrum] = None


@dataclass
class SpmBSDF:
    """surface_spm — the wave BSDF (reference src/bsdf/surface_spm.cpp)."""
    ior: ComplexSpectrum = None
    ext_ior: Optional[ComplexSpectrum] = None
    profile: SurfaceProfile = field(default_factory=SurfaceProfile)
    reflection_scale: Optional[Spectrum] = None
    transmission_scale: Optional[Spectrum] = None


@dataclass
class CompositeBSDF:
    """Wavelength-binned BSDF switch (reference include/wt/bsdf/composite.hpp)."""
    bins: list = field(default_factory=list)   # [(kmin, kmax, Material)]


@dataclass
class Material:
    """A flattened BSDF tree: base lobe + wrapper attributes."""
    bsdf: object = None                   # Diffuse/Dielectric/Spm/Composite
    twosided: bool = False
    scale: float = 1.0
    opacity: Optional[Texture] = None     # mask wrapper
    normalmap: Optional[Texture] = None   # normalmap wrapper
    name: str = ""
