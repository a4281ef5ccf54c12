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
import jax
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
    total: jnp.ndarray    # (N,) unnormalized ∫ASF dξ (edge powers + P0)


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
    """Full ASF with masking and the 0th-order lobe.

    DELIBERATE divergence from fsd.hpp:156 (which uses ψ0²·χ0): the
    0th-order term here is P0·χ0/(2π·σ0²), i.e. the SAME ξ-measure the
    edge-lobe powers and the sampling mixture use. The reference mixes
    measures — its P0 is divided by (k·fsd_unit)² (free_space_
    diffraction.cpp:117, the "horrible hack" comment) while its ASF
    keeps the unscaled ψ0², making ASF/sampling_density spike by
    (k·unit)² ≈ 1.6e4 on the forward lobe: unusable for unbiased RIS
    weights and it overweights the direct lobe in MIS pdfs. With this
    form ∫ASF dξ = Σpj + P0 = aperture.total exactly."""
    return asf_unclamped(ap, xi) * chi_e(xi) \
        + ap.P0 * INV_TWO_PI / P0_SIGMA ** 2 * chi_0(xi)


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


def empty_fr_aperture(N, B):
    """All-invalid aperture with B slots (pytree-shape placeholder for
    lanes/vertices without diffraction state)."""
    return FraunhoferAperture(
        e=jnp.zeros((N, B, 2)), v=jnp.zeros((N, B, 2)),
        a_b=jnp.zeros((N, B), jnp.complex64),
        iab_2=jnp.zeros((N, B), jnp.complex64),
        valid=jnp.zeros((N, B), bool), edge_pdf=jnp.zeros((N, B)),
        P0=jnp.zeros(N), P0_pdf=jnp.zeros(N), psi02=jnp.zeros(N),
        total=jnp.zeros(N))


def build_aperture(seg_p1, seg_p2, amp1, amp2, valid, p0_scale=1.0):
    """Assemble an aperture from clipped projected segments.

    seg_p1/p2 (N, B, 2): endpoints in canonical cross-section coordinates
    (the reference's fsd_unit = 1 mm space); amp1/amp2 (N, B): wavefront
    amplitude magnitudes at the endpoints
    (free_space_diffraction.cpp:72-95). p0_scale: k·fsd_unit — the
    0th-order lobe power is divided by its square
    (free_space_diffraction.cpp:119).
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
        psi02=jnp.zeros(e.shape[0]), total=jnp.zeros(e.shape[0]))

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
    P0 = 2.0 * math.pi * P0_SIGMA ** 2 * psi02 \
        / jnp.maximum(jnp.asarray(p0_scale, jnp.float32) ** 2, 1e-30)

    total = jnp.sum(pj, axis=1) + P0
    tot = jnp.maximum(total, 1e-30)
    return ap.replace(psi02=psi02, P0=P0,
                      P0_pdf=jnp.where(total > 0, P0 / tot, 1.0),
                      edge_pdf=pj / tot[:, None], total=total)


# ---------------------------------------------------------------------------
# sampling: numerically-built inverse-CDF tables over the canonical lobes
# (replaces the reference's data/fsd/iCDF*.fp64 files)
# ---------------------------------------------------------------------------

_LUT_PATH = os.path.join(os.path.dirname(__file__),
                         "_fraunhofer_luts_v2.npz")
_LUT_RES = 1024
_LUT_WARP = 4.0     # ζ = s·tan(θ): covers the full plane, fine near 0


def _build_luts():
    """Marginal/conditional CDFs of |α1|², |α2|² on a tan-warped grid.

    The lobes have power-law 1/ζ² tails (the published PA1/PA2 constants
    integrate over the whole plane) and ξ = ζ·Ξ⁻¹ compresses by 1/|e| for
    long edges, so a truncated uniform grid misses the physically relevant
    range; ζ = s·tan(θ) with θ uniform reaches infinity while keeping
    resolution at the core (the reference ships equivalent precomputed
    tables, data/fsd/iCDF*.fp64 — git-lfs stubs in this snapshot)."""
    th = np.linspace(-np.pi / 2 + 1e-6, np.pi / 2 - 1e-6, _LUT_RES + 1)
    z = _LUT_WARP * np.tan(th)                       # cell boundaries
    zc = 0.5 * (z[1:] + z[:-1])                      # cell centres
    dz = np.diff(z)
    X, Y = np.meshgrid(zc, zc, indexing="ij")

    def np_sinc(v):
        return np.sinc(v / np.pi)

    xs = np.where(np.abs(X) < 1e-9, 1e-9, X)
    r2 = xs * xs + Y * Y
    a1 = INV_TWO_PI * Y / (xs * r2) * (np.cos(0.5 * xs)
                                       - np_sinc(0.5 * xs))
    a2 = INV_TWO_PI * Y / r2 * np_sinc(0.5 * xs)
    # the tables sample the MASKED lobes χe·|αj|² — the χe mask removes
    # the non-normalizable core that the 0th-order lobe covers (this is
    # why the published PAj power constants fold χe in, fsd.hpp:57-61)
    t = 1.0 + CHI * r2
    chie = np.maximum(0.0, 1.0 - (3.0 / t ** 2 - 2.0 / t ** 3))
    cell = np.outer(dz, dz)                          # cell areas
    out = {}
    for name, a in (("a1", a1), ("a2", a2)):
        d = a * a * chie * cell                      # per-cell mass
        out[f"{name}_z"] = np.float32(d.sum())       # true lobe integral
        px = d.sum(axis=1)
        cx = np.concatenate([[0], np.cumsum(px)])
        cx = cx / cx[-1]
        cy = np.concatenate([np.zeros((_LUT_RES, 1)),
                             np.cumsum(d, axis=1)], axis=1)
        cy = cy / np.maximum(cy[:, -1:], 1e-300)
        out[f"{name}_cx"] = cx.astype(np.float32)    # (R+1,)
        out[f"{name}_cy"] = cy.astype(np.float32)    # (R, R+1)
    out["grid"] = z.astype(np.float32)               # boundaries (R+1,)
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
_Z1 = float(_LUTS["a1_z"])      # ∫ χe·|α1|² dζ over the sampled grid
_Z2 = float(_LUTS["a2_z"])


def _inv_cdf_interp(cdf_bounds, u):
    """Piecewise-linear inverse CDF over grid-cell boundaries.
    cdf_bounds (..., R+1) monotone 0→1; returns fractional cell index."""
    i = jnp.clip(jnp.sum((cdf_bounds < u[..., None]).astype(jnp.int32),
                         axis=-1) - 1, 0, _LUT_RES - 1)
    c0 = jnp.take_along_axis(cdf_bounds, i[..., None], axis=-1)[..., 0]
    c1 = jnp.take_along_axis(cdf_bounds, (i + 1)[..., None],
                             axis=-1)[..., 0]
    frac = (u - c0) / jnp.maximum(c1 - c0, 1e-30)
    return i.astype(jnp.float32) + jnp.clip(frac, 0.0, 1.0)


def _grid_at(fidx):
    i = jnp.clip(fidx.astype(jnp.int32), 0, _LUT_RES - 1)
    f = fidx - i
    return _GRID[i] * (1.0 - f) + _GRID[i + 1] * f


def _sample_lobe(cx, cy, u1, u2):
    """Inverse-CDF sample of a canonical lobe → ζ (N, 2), with linear
    interpolation inside grid cells."""
    fx = _inv_cdf_interp(cx[None, :], u1)
    zx = _grid_at(fx)
    row = cy[jnp.clip(fx.astype(jnp.int32), 0, _LUT_RES - 1)]
    fy = _inv_cdf_interp(row, u2)
    zy = _grid_at(fy)
    return jnp.stack([zx, zy], axis=-1)


def _chi_e_zeta(zx, zy):
    """χe evaluated on ζ components (per edge)."""
    r2 = zx * zx + zy * zy
    t = 1.0 + CHI * r2
    return jnp.maximum(0.0, 1.0 - (3.0 / (t * t) - 2.0 / (t * t * t)))


def proposal_density(ap: FraunhoferAperture, xi):
    """Exact density of the mixture `sample_xi` draws from (0th-order
    Gaussian + per-edge masked-lobe LUT draws mapped by Ξ⁻¹). This is the
    g needed for unbiased SIR/rejection weights — the reference's
    sampling_density plays this role with its PAj constants assumed to
    normalize the tables (fsd_sampler.cpp:96-110)."""
    zx, zy = _zeta(ap, xi)                     # (N, B)
    ee2 = jnp.sum(ap.e * ap.e, axis=-1)
    p1 = ee2 ** 2 * PA1 * jnp.abs(ap.a_b) ** 2
    p2 = ee2 ** 2 * PA2 * jnp.abs(ap.iab_2) ** 2
    w1 = p1 / jnp.maximum(p1 + p2, 1e-30)
    chie = _chi_e_zeta(zx, zy)
    l1 = chie * alpha1(zx, zy) ** 2 / _Z1
    l2 = chie * alpha2(zx, zy) ** 2 / _Z2
    per_edge = ap.edge_pdf * ee2 * (w1 * l1 + (1.0 - w1) * l2)
    g_edges = jnp.sum(jnp.where(ap.valid, per_edge, 0.0), axis=1)
    xi2 = jnp.sum(xi * xi, axis=-1)
    g0 = ap.P0_pdf * jnp.exp(-0.5 * xi2 / P0_SIGMA ** 2) \
        * INV_TWO_PI / P0_SIGMA ** 2
    return g_edges + g0


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
    ptot = jnp.maximum(p1 + p2, 1e-30)
    use1 = u4[:, 2] * ptot < p1
    # conditional rescale: u[2] stays uniform given the branch it selected
    u_cond = jnp.where(use1, u4[:, 2] * ptot / jnp.maximum(p1, 1e-30),
                       (u4[:, 2] * ptot - p1) / jnp.maximum(p2, 1e-30))
    u_cond = jnp.clip(u_cond, 0.0, 1.0 - 1e-7)
    z1 = _sample_lobe(_A1_CX, _A1_CY, u4[:, 3], u_cond)
    z2 = _sample_lobe(_A2_CX, _A2_CY, u4[:, 3], u_cond)
    zeta = jnp.where(use1[:, None], z1, z2)
    # ξ = ζ·Ξ⁻¹; Ξ = [e, m] with |det| = ee2
    ex, ey = e_sel[:, 0], e_sel[:, 1]
    det = jnp.maximum(ee2, 1e-20)
    xi_e = jnp.stack([(zeta[:, 0] * ex + zeta[:, 1] * ey) / det,
                      (zeta[:, 0] * ey - zeta[:, 1] * ex) / det], axis=-1)

    xi = jnp.where(pick0[:, None], xi0, xi_e)
    dens = proposal_density(ap, xi)
    return xi, dens, pick0


def sample_xi_sir(ap: FraunhoferAperture, uM4, u_pick):
    """Resampled-importance-sampling draw of ξ ~ ASF.

    TPU re-design of the reference's samplers (fsd_sampler.cpp:85-151):
    its rejection loop is unbounded (unsuited to lock-step lanes) and its
    SIR variant assumes the winner is exactly ASF-distributed (weight 1) —
    biased whenever ASF ≰ M·proposal, which long edges violate badly.
    Here the standard unbiased RIS estimator (Talbot et al. 2005) is used:
    draw M proposals from the exact mixture density g, pick one ∝ w =
    ASF/g, and carry weight (1/M)·Σw so E[weight·δ(ξ)] = ASF(ξ) for ANY M.

    uM4 (N, M, 4): per-proposal uniforms; u_pick (N,): resampling pick.
    Returns (xi (N, 2), asf (N,) ASF at the winner, w_ris (N,) =
    (1/M)·Σ_k ASF(ξ_k)/g(ξ_k), valid). The caller multiplies throughput
    by w_ris·recp_I and uses pdf ≈ asf·recp_I for MIS bookkeeping (same
    approximation as the reference, fsd_sampler.hpp:61).
    """
    N, M, _ = uM4.shape
    xi_m, dens_m, _ = jax.vmap(lambda u: sample_xi(ap, u),
                               in_axes=1, out_axes=1)(uM4)     # (N, M, ...)
    asf_m = jax.vmap(lambda x: asf(ap, x), in_axes=1,
                     out_axes=1)(xi_m)
    w = jnp.where(dens_m > 0, asf_m / jnp.maximum(dens_m, 1e-30), 0.0)
    w = jnp.where(jnp.isfinite(w), w, 0.0)
    W = jnp.sum(w, axis=1)
    cdf = jnp.cumsum(w, axis=1)
    tgt = u_pick * W
    pick = jnp.sum((cdf < tgt[:, None]).astype(jnp.int32), axis=1)
    pick = jnp.clip(pick, 0, M - 1)
    rows = jnp.arange(N)
    xi = xi_m[rows, pick]
    asf_v = asf_m[rows, pick]
    w_ris = W / M
    valid = (W > 0) & jnp.isfinite(asf_v)
    return xi, asf_v, w_ris, valid


WO2_CUTOFF = 0.85     # free_space_diffraction.hpp:37


def xi_to_wo(xi, scale):
    """Canonical ξ → local direction (tan→sin per component + cutoff,
    free_space_diffraction.hpp sample():85-97). Returns (wo (N, 3) in the
    beam frame, valid)."""
    zeta = xi / jnp.asarray(scale)[..., None]
    wol = zeta / jnp.sqrt(1.0 + zeta * zeta)
    wo2 = jnp.sum(wol * wol, axis=-1)
    ok = wo2 < WO2_CUTOFF
    z = jnp.sqrt(jnp.maximum(1.0 - wo2, 1e-6))
    return jnp.concatenate([wol, z[..., None]], axis=-1), ok


def wo_to_xi(wol, scale):
    """Local direction → canonical ξ (sin→tan,
    free_space_diffraction.hpp pdf():119-131). Returns (xi, valid)."""
    w2 = wol[..., :2]
    wo2 = jnp.sum(w2 * w2, axis=-1)
    ok = (wol[..., 2] > 0) & (wo2 < WO2_CUTOFF)
    zeta = w2 / jnp.sqrt(jnp.maximum(1.0 - w2 * w2, 1e-6))
    return zeta * jnp.asarray(scale)[..., None], ok


# ---------------------------------------------------------------------------
# 3D aperture construction from swept edge queries
# (free_space_diffraction.cpp ctor:33-126)
# ---------------------------------------------------------------------------

FSD_UNIT_M = 1e-3     # canonical space is mm-based (fsd_unit = 1 mm)


def build_aperture_3d(edges, idx, origin, rd, fx, fy, sigma_m, r_env,
                      k, subdiv: int = 4, curv=None):
    """Project ball/sweep-queried edges into the beam cross-section and
    assemble the canonical aperture.

    edges: EdgeTable; idx (N, K) rows (−1 padding); origin (N, 3) point on
    the beam axis in the cross-section plane; rd (N, 3) beam direction;
    fx/fy (N, 3) cross-section frame axes; sigma_m (N,) wavefront σ [m];
    r_env (N,) envelope (3σ) radius [m]; k (N,) wavenumber [rad/m].

    Steps per edge (reference free_space_diffraction.cpp:44-103):
    silhouette filter dot(d,n1)·dot(d,n2) < 0 → orthographic projection
    onto the cross-section → clip to the envelope circle → subdivide into
    `subdiv` segments with Gaussian-wavefront amplitudes at the split
    points → canonical mm units.

    curv (N,) optional [rad/m²]: quadratic wavefront-phase coefficient —
    amplitudes gain e^{i·curv·|u|²} with u the cross-section offset [m].
    Pass k/2·(1/R_src + 1/L_det) to account for the incident spherical
    curvature AND the finite detector distance (the lens-less Fourier
    configuration): the stationary-phase fringe positions then become
    independent of which beam of the source cone carried them — without
    it every beam's pattern shifts by ~(R+L)·tilt and the source-cone
    ensemble smears the fringe minima (measured on the double-slit
    calibration; the reference's REAL-amplitude aperture,
    free_space_diffraction.cpp:72-95, has exactly this smear).
    """
    N, K = idx.shape
    i = jnp.maximum(idx, 0)
    ok = idx >= 0
    row = edges.pack[i]          # ONE packed gather (layout: EdgeTable)

    # projected-silhouette filter
    d_n1 = jnp.sum(rd[:, None, :] * row[..., 6:9], axis=-1)
    d_n2 = jnp.sum(rd[:, None, :] * row[..., 9:12], axis=-1)
    ok &= (d_n1 * d_n2) < 0.0

    # endpoints in cross-section coordinates [m]
    p0 = row[..., 0:3]
    p1 = p0 + row[..., 3:6] * row[..., 19:20]
    w0 = p0 - origin[:, None, :]
    w1 = p1 - origin[:, None, :]
    u1 = jnp.stack([jnp.sum(w0 * fx[:, None, :], axis=-1),
                    jnp.sum(w0 * fy[:, None, :], axis=-1)], axis=-1)
    u2 = jnp.stack([jnp.sum(w1 * fx[:, None, :], axis=-1),
                    jnp.sum(w1 * fy[:, None, :], axis=-1)], axis=-1)

    # clip the 2D segment to the envelope circle |u| ≤ r_env
    dseg = u2 - u1
    aa = jnp.maximum(jnp.sum(dseg * dseg, axis=-1), 1e-30)
    bb = jnp.sum(u1 * dseg, axis=-1)
    cc = jnp.sum(u1 * u1, axis=-1) - (r_env[:, None]) ** 2
    disc = bb * bb - aa * cc
    ok &= disc > 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = jnp.clip((-bb - sq) / aa, 0.0, 1.0)
    t2 = jnp.clip((-bb + sq) / aa, 0.0, 1.0)
    ok &= (t2 - t1) > 1e-9

    # subdivide into `subdiv` segments; amplitudes at the split points
    ts = t1[..., None] + (t2 - t1)[..., None] \
        * jnp.linspace(0.0, 1.0, subdiv + 1)              # (N, K, S+1)
    pts = u1[..., None, :] + ts[..., None] * dseg[..., None, :]
    u2_ = jnp.sum(pts * pts, axis=-1)
    q = u2_ / jnp.maximum(sigma_m[:, None, None] ** 2, 1e-30)
    dens = jnp.exp(-0.5 * q) / jnp.maximum(
        2.0 * math.pi * sigma_m[:, None, None] ** 2, 1e-30)
    amp = jnp.sqrt(dens).astype(jnp.complex64)             # (N, K, S+1)
    if curv is not None:
        amp = amp * jnp.exp(
            1j * (curv[:, None, None] * u2_).astype(jnp.complex64))

    seg_p1 = pts[..., :-1, :].reshape(N, K * subdiv, 2) / FSD_UNIT_M
    seg_p2 = pts[..., 1:, :].reshape(N, K * subdiv, 2) / FSD_UNIT_M
    amp1 = amp[..., :-1].reshape(N, K * subdiv)
    amp2 = amp[..., 1:].reshape(N, K * subdiv)
    valid = jnp.broadcast_to(ok[..., None], (N, K, subdiv)) \
        .reshape(N, K * subdiv)
    scale = k * FSD_UNIT_M
    return build_aperture(seg_p1, seg_p2, amp1, amp2, valid,
                          p0_scale=scale), scale
