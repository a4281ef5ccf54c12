"""Wave-aware surface profiles: dirac, gaussian, fractal (K-correlation).

Batched device math reproducing the behaviour of
reference include/wt/interaction/surface_profile/{dirac,gaussian,fractal}.hpp:
a profile's power spectral density (PSD) drives first-order SPM scatter and
the Rayleigh specular fraction α(k). Roughness parameters keep the
reference's millimetre-based units (T in mm², σ in 1/mm, k·mm products), so
scene files are interpreted identically; wavenumbers enter in SI rad/m and
are converted internally.

The fractal sampler uses the importance strategy of Holzschuch & Pacanowski
2017 ("A Two-Scale Microfacet Reflectance Model...") like the reference
(src/interaction/surface_profile/fractal.cpp:27-70).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

INV_TWO_PI = 1.0 / (2.0 * math.pi)
INV_PI = 1.0 / math.pi
# mean wavenumber 2π/550nm expressed in 1/mm (reference
# gaussian.hpp/fractal.hpp `meank`)
MEANK_MM = 2.0 * math.pi / 550e-9 * 1e-3
MAX_GGX_ALPHA = 0.75
MAX_T = 70.0 ** 2    # mm²

PROFILE_DIRAC = 0
PROFILE_GAUSSIAN = 1
PROFILE_FRACTAL = 2


def k_mm(k_si):
    """SI wavenumber [rad/m] → the reference's 1/mm convention."""
    return k_si * 1e-3


def roughness_to_T(alpha):
    """GGX-matched perceptual roughness → correlation area T [mm²]
    (reference fractal.hpp roughness_to_T)."""
    a2 = jnp.clip(alpha, 0.0, MAX_GGX_ALPHA) ** 2
    return jnp.minimum(MAX_T, (1.0 - a2) / (4.0 * MEANK_MM ** 2
                                            * jnp.maximum(a2, 1e-12)))


def roughness_to_alpha_param(alpha):
    """Roughness → Rayleigh α parameter (reference roughness_to_alpha)."""
    return (alpha / 9.0) ** 2


class ProfileParams:
    """Per-lane profile parameters (SoA): all (...,) arrays."""

    def __init__(self, ptype, T, alpha_param, gamma, sigma2_norm):
        self.ptype = ptype            # i32: 0 dirac / 1 gaussian / 2 fractal
        self.T = T                    # mm² (gaussian: 1/σ²)
        self.alpha_param = alpha_param
        self.gamma = gamma
        self.sigma2_norm = sigma2_norm


def make_params(ptype, roughness, gamma, k_si, T_direct=None,
                sigmah=None):
    """Resolve profile parameters at wavenumber k.

    roughness: perceptual roughness value (texture-evaluated).
    T_direct/sigmah: direct (T, σ_h) parameterization when not None.
    """
    km = k_mm(k_si)
    if T_direct is None:
        T = roughness_to_T(roughness)
        alpha_param = roughness_to_alpha_param(roughness)
    else:
        T = T_direct
        alpha_param = sigmah ** 2
    k2T = km * km * T
    # normalization 1/(1 - (1 + k²T)^-(γ-1)/2)  (fractal.hpp sigma2_normalized;
    # the gaussian profile is the γ→∞ limit with T=1/σ²:
    # 1/(1-exp(-k²/2σ²)))
    x = 1.0 + k2T
    p_frac = jnp.power(x, 0.5 * (gamma - 1.0))
    norm_frac = 1.0 / jnp.maximum(1.0 - 1.0 / jnp.maximum(p_frac, 1.0 + 1e-9),
                                  1e-9)
    sigma2 = 1.0 / jnp.maximum(T, 1e-12)      # gaussian variance in 1/mm²
    norm_gauss = 1.0 / jnp.maximum(
        1.0 - jnp.exp(-0.5 * km * km / jnp.maximum(sigma2, 1e-12)), 1e-9)
    sigma2_norm = jnp.where(ptype == PROFILE_GAUSSIAN, norm_gauss, norm_frac)
    return ProfileParams(ptype, T, alpha_param, gamma, sigma2_norm)


def alpha_specular(params: ProfileParams, wi_z, wo_z, k_si):
    """Specular (coherent) fraction: Rayleigh roughness factor
    exp(−((|wi.z|+|wo.z|)·k·σ_h)²) (gaussian/fractal.hpp alpha())."""
    km = k_mm(k_si)
    a = ((jnp.abs(wi_z) + jnp.abs(wo_z)) * km) ** 2 * params.alpha_param
    return jnp.where(params.ptype == PROFILE_DIRAC, 1.0, jnp.exp(-a))


def psd(params: ProfileParams, z2, k_si):
    """PSD at squared spatial frequency |z|² [1/mm²]; z = k(wi⊥+wo⊥)."""
    km = k_mm(k_si)
    # fractal / K-correlation
    x = 1.0 + params.T * z2
    pf = jnp.power(jnp.maximum(x, 1e-12), 0.5 * (params.gamma + 1.0))
    f_frac = (params.gamma - 1.0) * params.T / jnp.maximum(pf, 1e-12)
    # gaussian
    sigma2 = 1.0 / jnp.maximum(params.T, 1e-12)
    e = jnp.exp(-0.5 * z2 / jnp.maximum(sigma2, 1e-12))
    f_gauss = e / jnp.maximum(sigma2, 1e-12)
    f = jnp.where(params.ptype == PROFILE_GAUSSIAN, f_gauss, f_frac)
    out = params.sigma2_norm * INV_TWO_PI * km * km * f
    return jnp.where(params.ptype == PROFILE_DIRAC, 0.0, out)


def psd_dirs(params: ProfileParams, wi, wo, k_si):
    """PSD for local directions wi, wo (both (..., 3))."""
    km = k_mm(k_si)
    zx = km * (wi[..., 0] + wo[..., 0])
    zy = km * (wi[..., 1] + wo[..., 1])
    return psd(params, zx * zx + zy * zy, k_si)


def _phi_max(f_k, s):
    """Azimuthal truncation: directions must stay on the unit disk."""
    degenerate = (f_k < 1e-9) | (s < 1e-9)
    # clip strictly inside (-1, 1): arccos' slope is infinite at the
    # boundary and clip's zero tangent there yields inf*0 = NaN in JVPs
    c = jnp.clip((f_k ** 2 + s ** 2 - 1.0)
                 / jnp.maximum(2.0 * f_k * s, 1e-12),
                 -1.0 + 1e-6, 1.0 - 1e-6)
    return jnp.where(degenerate, math.pi, jnp.arccos(c))


def sample(params: ProfileParams, wi, k_si, u2):
    """Sample scattered direction from the profile (fractal importance
    strategy; the gaussian profile reuses it — the lobe shapes coincide at
    γ→∞ well enough for importance weights, psd/pdf stays unbiased).

    Returns (wo, pdf, psd_val, valid). wi local (..., 3), u2 (..., 2).
    """
    km = k_mm(k_si)
    s = jnp.sqrt(jnp.maximum(1.0 - wi[..., 2] ** 2, 1e-24))
    phi_i = jnp.where(s > 0, jnp.arctan2(wi[..., 1], wi[..., 0]), 0.0)
    gamma = jnp.where(params.ptype == PROFILE_GAUSSIAN, 40.0, params.gamma)
    T = params.T
    sqrtT = jnp.sqrt(jnp.maximum(T, 1e-12))

    k2T = km * km * T
    M = 1.0 - jnp.power(1.0 + k2T * (1.0 + s) ** 2, -0.5 * (gamma - 1.0))
    base = jnp.power(jnp.maximum(1.0 - M * u2[..., 0], 1e-12),
                     -2.0 / (gamma - 1.0))
    # eps floor: at u=0 base==1 exactly and d(sqrt)/dx -> inf would
    # poison JVP tangents of every downstream quantity
    f = jnp.sqrt(jnp.maximum(base - 1.0, 1e-24)) / sqrtT   # 1/mm
    f_k = f / km

    pm = _phi_max(f_k, s)
    phi_f = phi_i + (2.0 * u2[..., 1] - 1.0) * pm
    vfx = f * jnp.cos(phi_f)
    vfy = f * jnp.sin(phi_f)

    # ζ = k(wi⊥+wo⊥) ⇒ wo⊥ = ζ/k − wi⊥
    wox = vfx / km - wi[..., 0]
    woy = vfy / km - wi[..., 1]
    wo2 = wox * wox + woy * woy
    valid = wo2 < 1.0
    z = jnp.sqrt(jnp.maximum(1.0 - wo2, 1e-24))
    z = jnp.where(wi[..., 2] >= 0, z, -z)
    wo = jnp.stack([wox, woy, z], axis=-1)

    psd_val = psd(params, vfx * vfx + vfy * vfy, k_si)
    w = INV_PI * pm
    pdfv = jnp.where(w > 1e-2, jnp.abs(z) * psd_val / jnp.maximum(w, 1e-2),
                     0.0)
    valid &= pdfv > 0
    return wo, pdfv, psd_val, valid


def pdf(params: ProfileParams, wi, wo, k_si):
    """Sampling density of `sample` for (wi, wo) (fractal.hpp pdf())."""
    zeta_kx = wi[..., 0] + wo[..., 0]
    zeta_ky = wi[..., 1] + wo[..., 1]
    f_k = jnp.sqrt(zeta_kx ** 2 + zeta_ky ** 2)
    s = jnp.sqrt(jnp.maximum(0.0, 1.0 - wi[..., 2] ** 2))
    pm = _phi_max(f_k, s)
    psd_val = psd_dirs(params, wi, wo, k_si)
    w = INV_PI * pm
    return jnp.where(w > 1e-2,
                     jnp.abs(wo[..., 2]) * psd_val / jnp.maximum(w, 1e-2),
                     0.0)
