"""Fraunhofer free-space diffraction — the plt_bdpt FSD flavour.

Reference include/wt/interaction/fsd/fraunhofer/fsd.hpp:30-186 and
src/interaction/fsd/fraunhofer/free_space_diffraction.cpp (the SIGGRAPH'24
"A Free-Space Diffraction BSDF" model): the aperture is the set of
2D-projected edge segments clipped to the beam cross-section, each carrying
complex amplitudes a_b = a(v1)−a(v2) and iab/2 = i(a(v1)+a(v2))/2 from the
Gaussian wavefront; the angular scattering function is the coherent
|Σ_b Ψ_b(ξ)|² over analytic lobes α1/α2 with masking χe plus a 0th-order
Gaussian lobe χ0.

The reference samples ξ from precomputed inverse-CDF tables shipped as
data files (git-lfs stubs in this snapshot); here the equivalent tables
are built numerically at import from the closed-form lobe shapes and
cached next to this module.

All evaluation is lane-batched jnp over (N, B) edge slots.
"""

from __future__ import annotations

import math
import os

import numpy as np
import jax.numpy as jnp
from flax import struct

INV_TWO_PI = 1.0 / (2.0 * math.pi)

# Published lobe-power constants (fsd.hpp:57-61): ∫ χe·|α1|² and ∫ χe·|α2|²
PA1 = 0.0049361075794549872500
PA2 = 0.21899789398059305541
P0_SIGMA = 0.288675134594813 / 4.0
CHI = 0.830092714835359


def _sinc(x):
    return jnp.sinc(x / math.pi)      # sin(x)/x


def alpha1(zx, zy):
    """fsd.hpp alpha1: (1/2π)·y/(x(x²+y²))·(cos(x/2) − sinc(x/2)).

    The reference returns 0 at exactly x==0; both lobes have finite
    continuous limits there (α1→0, α2→1/(2πy)), which we take instead —
    vertical edges probed exactly along their normal stay well-defined."""
    x = jnp.where(jnp.abs(zx) < 1e-9, 1e-9, zx)
    r2 = x * x + zy * zy
    return INV_TWO_PI * zy / (x * jnp.maximum(r2, 1e-30)) \
        * (jnp.cos(0.5 * x) - _sinc(0.5 * x))


def alpha2(zx, zy):
    """fsd.hpp alpha2: (1/2π)·y/(x²+y²)·sinc(x/2) (continuous at x=0)."""
    x = jnp.where(jnp.abs(zx) < 1e-9, 1e-9, zx)
    r2 = x * x + zy * zy
    return INV_TWO_PI * zy / jnp.maximum(r2, 1e-30) * _sinc(0.5 * x)


def chi_e(xi):
    """Diffracted-lobe mask (fsd.hpp chi_e)."""
    xi2 = jnp.sum(xi * xi, axis=-1)
    t = 1.0 + CHI * xi2
    return jnp.maximum(0.0, 1.0 - (3.0 / (t * t) - 2.0 / (t * t * t)))


def chi_0(xi):
    """0th-order-lobe mask (fsd.hpp chi_0)."""
    xi2 = jnp.sum(xi * xi, axis=-1) / (P0_SIGMA * P0_SIGMA)
    return jnp.exp(-0.5 * xi2)


@struct.dataclass
class FraunhoferAperture:
    """(N, B) edge slots in the beam's cross-section frame (canonical
    fsd units: lengths premultiplied so ξ is dimensionless)."""
    e: jnp.ndarray        # (N, B, 2) edge vector
    v: jnp.ndarray        # (N, B, 2) midpoint
    a_b: jnp.ndarray      # (N, B) complex
    iab_2: jnp.ndarray    # (N, B) complex
    valid: jnp.ndarray    # (N, B)
    edge_pdf: jnp.ndarray  # (N, B) normalized lobe-power pdfs
    P0: jnp.ndarray       # (N,)
    P0_pdf: jnp.ndarray   # (N,)
    psi02: jnp.ndarray    # (N,)


def _zeta(ap: FraunhoferAperture, xi):
    """ζ = ξ·Ξ with Ξ = [e, m], m = (e.y, −e.x) (fsd.hpp Xi()).
    xi (N, 2) → per-edge (N, B) components."""
    ex = ap.e[..., 0]
    ey = ap.e[..., 1]
    xix = xi[:, 0:1]
    xiy = xi[:, 1:2]
    zx = xix * ex + xiy * ey
    zy = xix * ey - xiy * ex
    return zx, zy


def psi(ap: FraunhoferAperture, xi):
    """Per-edge complex amplitude Ψ_b(ξ) (fsd.hpp Psi). xi (N, 2)."""
    zx, zy = _zeta(ap, xi)
    a1 = ap.a_b * alpha1(zx, zy).astype(jnp.complex64)
    a2 = ap.iab_2 * alpha2(zx, zy).astype(jnp.complex64)
    ee2 = jnp.sum(ap.e * ap.e, axis=-1)
    vxi = ap.v[..., 0] * xi[:, 0:1] + ap.v[..., 1] * xi[:, 1:2]
    phase = jnp.exp(-1j * vxi.astype(jnp.complex64))
    out = ee2.astype(jnp.complex64) * phase * (a1 + a2)
    return jnp.where(ap.valid, out, 0.0)


def asf_unclamped(ap: FraunhoferAperture, xi):
    """|Σ_b Ψ_b|² (fsd.hpp ASF_unclamped). xi (N, 2) → (N,)."""
    amp = jnp.sum(psi(ap, xi), axis=1)
    return jnp.abs(amp) ** 2


def asf(ap: FraunhoferAperture, xi):
    """Full ASF with masking and the 0th-order lobe (fsd.hpp ASF)."""
    return asf_unclamped(ap, xi) * chi_e(xi) + ap.psi02 * chi_0(xi)


def sampling_density(ap: FraunhoferAperture, xi):
    """Incoherent per-edge |Ψ|² + 0th lobe (fsd.hpp sampling_density)."""
    zx, zy = _zeta(ap, xi)
    a1 = jnp.abs(ap.a_b) * jnp.abs(alpha1(zx, zy))
    a2v = jnp.abs(ap.iab_2) * jnp.abs(alpha2(zx, zy))
    ee2 = jnp.sum(ap.e * ap.e, axis=-1)
    psi2 = ee2 ** 2 * (a1 ** 2 + a2v ** 2)
    diff = jnp.sum(jnp.where(ap.valid, psi2, 0.0), axis=1)
    return diff * chi_e(xi) + ap.P0 * INV_TWO_PI / P0_SIGMA ** 2 \
        * chi_0(xi)


def edge_powers(e, a_b, iab_2):
    """Per-edge lobe powers Pa1+Pa2 (fsd.hpp Pj)."""
    ee2 = jnp.sum(e * e, axis=-1)
    return ee2 ** 2 * (PA1 * jnp.abs(a_b) ** 2
                       + PA2 * jnp.abs(iab_2) ** 2)


def build_aperture(seg_p1, seg_p2, amp1, amp2, valid):
    """Assemble an aperture from clipped projected segments.

    seg_p1/p2 (N, B, 2): endpoints in canonical (wavenumber-scaled) cross-
    section coordinates; amp1/amp2 (N, B): wavefront amplitude magnitudes
    at the endpoints (free_space_diffraction.cpp:72-95).
    """
    e = seg_p2 - seg_p1
    v = 0.5 * (seg_p1 + seg_p2)
    a_b = (amp1 - amp2).astype(jnp.complex64)
    iab_2 = (1j * 0.5) * (amp1 + amp2).astype(jnp.complex64)
    pj = edge_powers(e, a_b, iab_2)
    valid = valid & (pj > 0)
    pj = jnp.where(valid, pj, 0.0)

    ap = FraunhoferAperture(
        e=e, v=v, a_b=jnp.where(valid, a_b, 0), iab_2=jnp.where(valid,
                                                                iab_2, 0),
        valid=valid, edge_pdf=pj,
        P0=jnp.zeros(e.shape[0]), P0_pdf=jnp.zeros(e.shape[0]),
        psi02=jnp.zeros(e.shape[0]))

    # 0th-order power from the 8-direction ASF ring probe
    # (free_space_diffraction.cpp:105-117)
    r = 3.0 * P0_SIGMA
    dirs = np.stack([
        [-math.sqrt(0.5), -math.sqrt(0.5)], [-1, 0],
        [-math.sqrt(0.5), math.sqrt(0.5)], [0, 1],
        [math.sqrt(0.5), math.sqrt(0.5)], [1, 0],
        [math.sqrt(0.5), -math.sqrt(0.5)], [0, -1]]).astype(np.float32)
    acc = jnp.zeros(e.shape[0])
    for d in dirs:
        acc = acc + asf_unclamped(ap, jnp.broadcast_to(
            jnp.asarray(r * d), (e.shape[0], 2)))
    psi02 = acc / 8.0
    P0 = 2.0 * math.pi * P0_SIGMA ** 2 * psi02

    total = jnp.sum(pj, axis=1) + P0
    tot = jnp.maximum(total, 1e-30)
    return ap.replace(psi02=psi02, P0=P0,
                      P0_pdf=jnp.where(total > 0, P0 / tot, 1.0),
                      edge_pdf=pj / tot[:, None])


# ---------------------------------------------------------------------------
# sampling: numerically-built inverse-CDF tables over the canonical lobes
# (replaces the reference's data/fsd/iCDF*.fp64 files)
# ---------------------------------------------------------------------------

_LUT_PATH = os.path.join(os.path.dirname(__file__), "_fraunhofer_luts.npz")
_LUT_RES = 512
_LUT_RANGE = 60.0      # canonical ζ domain half-width


def _build_luts():
    x = np.linspace(-_LUT_RANGE, _LUT_RANGE, _LUT_RES)
    y = np.linspace(-_LUT_RANGE, _LUT_RANGE, _LUT_RES)
    X, Y = np.meshgrid(x, y, indexing="ij")

    def np_sinc(v):
        return np.sinc(v / np.pi)

    xs = np.where(np.abs(X) < 1e-9, 1e-9, X)
    r2 = xs * xs + Y * Y
    a1 = INV_TWO_PI * Y / (xs * r2) * (np.cos(0.5 * xs)
                                       - np_sinc(0.5 * xs))
    a2 = INV_TWO_PI * Y / r2 * np_sinc(0.5 * xs)
    out = {}
    for name, a in (("a1", a1), ("a2", a2)):
        d = a * a
        # marginal in x, conditional in y
        px = d.sum(axis=1)
        cx = np.cumsum(px)
        cx = cx / cx[-1]
        cy = np.cumsum(d, axis=1)
        cy = cy / np.maximum(cy[:, -1:], 1e-300)
        out[f"{name}_cx"] = cx.astype(np.float32)
        out[f"{name}_cy"] = cy.astype(np.float32)
    out["grid"] = x.astype(np.float32)
    return out


def _load_luts():
    if os.path.isfile(_LUT_PATH):
        z = np.load(_LUT_PATH)
        return {k: z[k] for k in z.files}
    luts = _build_luts()
    try:
        np.savez_compressed(_LUT_PATH, **luts)
    except OSError:
        pass
    return luts


_LUTS = _load_luts()
_GRID = jnp.asarray(_LUTS["grid"])
_A1_CX = jnp.asarray(_LUTS["a1_cx"])
_A1_CY = jnp.asarray(_LUTS["a1_cy"])
_A2_CX = jnp.asarray(_LUTS["a2_cx"])
_A2_CY = jnp.asarray(_LUTS["a2_cy"])


def _sample_lobe(cx, cy, u1, u2):
    """Inverse-CDF sample of a canonical lobe → ζ (N, 2)."""
    ix = jnp.clip(jnp.searchsorted(cx, u1), 0, _LUT_RES - 1)
    zx = _GRID[ix]
    row = cy[ix]
    # per-row inverse CDF (vectorized comparison count)
    iy = jnp.clip(jnp.sum((row < u2[:, None]).astype(jnp.int32), axis=1),
                  0, _LUT_RES - 1)
    zy = _GRID[iy]
    return jnp.stack([zx, zy], axis=-1)


def sample_xi(ap: FraunhoferAperture, u4):
    """Sample ξ from the aperture's lobe mixture.

    u4 (N, 4): lobe pick, edge pick, 2 for the shape. Returns (xi (N, 2),
    pdf-ish density, is_zero_order (N,)). The density pairs with
    `sampling_density` for the weight (fsd_lut.hpp sampler semantics).
    """
    N = u4.shape[0]
    pick0 = u4[:, 0] < ap.P0_pdf
    # 0th order: gaussian of σ=P0_SIGMA (Box-Muller from u[2], u[3])
    r = P0_SIGMA * jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u4[:, 2], 1e-12)))
    th = 2.0 * math.pi * u4[:, 3]
    xi0 = jnp.stack([r * jnp.cos(th), r * jnp.sin(th)], axis=-1)

    # edge pick proportional to edge_pdf
    cdf = jnp.cumsum(ap.edge_pdf, axis=1)
    tot = jnp.maximum(cdf[:, -1:], 1e-30)
    tgt = (u4[:, 1:2] * tot)
    bi = jnp.sum((cdf < tgt).astype(jnp.int32), axis=1)
    bi = jnp.clip(bi, 0, ap.e.shape[1] - 1)
    rows = jnp.arange(N)
    e_sel = ap.e[rows, bi]
    a_b = ap.a_b[rows, bi]
    iab = ap.iab_2[rows, bi]
    # choose α1 vs α2 sub-lobe by power share
    ee2 = jnp.sum(e_sel * e_sel, axis=-1)
    p1 = ee2 ** 2 * PA1 * jnp.abs(a_b) ** 2
    p2 = ee2 ** 2 * PA2 * jnp.abs(iab) ** 2
    use1 = u4[:, 2] * (p1 + p2) < p1         # reuse u[2] for the branch
    z1 = _sample_lobe(_A1_CX, _A1_CY, u4[:, 3], u4[:, 2])
    z2 = _sample_lobe(_A2_CX, _A2_CY, u4[:, 3], u4[:, 2])
    zeta = jnp.where(use1[:, None], z1, z2)
    # ξ = ζ·Ξ⁻¹; Ξ = [e, m] with |det| = ee2
    ex, ey = e_sel[:, 0], e_sel[:, 1]
    det = jnp.maximum(ee2, 1e-20)
    xi_e = jnp.stack([(zeta[:, 0] * ex + zeta[:, 1] * ey) / det,
                      (zeta[:, 0] * ey - zeta[:, 1] * ex) / det], axis=-1)

    xi = jnp.where(pick0[:, None], xi0, xi_e)
    dens = sampling_density(ap, xi)
    return xi, dens, pick0
