"""Absolute radiometric calibration of the coverage pipeline.

Closes PARITY "Known gaps" #4: the virtual-plane map is validated
against the ANALYTIC free-space value, not just for shadowing shape.

Convention (derived from the reference's virtual_plane design,
virtual_plane_sensor.hpp:165-170 importance W=1/(π·A_element), and the
light-image develop normalization by samples-per-element): the developed
element value of a forward render is

    V = (W·H / π) · E          E = incident power density [W/m²]

so the dB tonemap of V is the dB of E up to the fixed offset
10·log10(W·H/π). Free space: E(ρ) = I·d/(d²+ρ²)^{3/2} for a point
source of radiant intensity I at perpendicular distance d (the Friis
path-loss law P_r/P_t = A_eff/(4π r²) with A_eff folded into the
element response). Verified analytically here at 10 GHz.
"""

import math
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("WT_SLOW_TESTS"),
    reason="slow; set WT_SLOW_TESTS=1")

C = 299792458.0


def _free_space_scene(res=32, extent=4.0, d=10.0, I=7.0):
    import numpy as np
    from wave_tracer_tpu.bsdf import DiffuseBSDF, Material
    from wave_tracer_tpu.core.transform import Transform
    from wave_tracer_tpu.emitter.model import PointEmitter
    from wave_tracer_tpu.geometry import mesh
    from wave_tracer_tpu.scene import IntegratorConfig, Scene, Shape
    from wave_tracer_tpu.sensor.perspective import lookat_matrix
    from wave_tracer_tpu.sensor.response import Response
    from wave_tracer_tpu.sensor.virtual_plane import VirtualPlaneSensor
    from wave_tracer_tpu.spectrum.spectra import (DiscreteSpectrum,
                                                  UniformSpectrum)
    from wave_tracer_tpu.texture.texture import ConstantSpectrumTexture

    lam = C / 10e9
    k0 = 2 * np.pi / lam
    tx = PointEmitter(
        spectrum=DiscreteSpectrum(np.array([k0]), np.array([I])),
        position=np.array([0.0, 0.0, 0.0]))
    sensor = VirtualPlaneSensor(
        width=res, height=res, extent=(extent, extent),
        to_world=lookat_matrix([0, 0, d], [0, 0, 0], up=[0, 1, 0]),
        samples=8,
        response=Response(type="monochromatic",
                          spectrum=DiscreteSpectrum(np.array([k0]),
                                                    np.array([1.0]))))
    # geometry far outside the transmitter→plane cone (a scene must have
    # at least one triangle; it must not shadow anything)
    far = Shape(mesh.rectangle(1.0, Transform.from_rows(
        [1, 0, 0, 500, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1])),
        Material(bsdf=DiffuseBSDF(reflectance=ConstantSpectrumTexture(
            UniformSpectrum(0.5, 1.0, 1e9))), twosided=True, name="far"))
    return Scene(shapes=[far], emitters=[tx], sensors=[sensor],
                 integrator=IntegratorConfig(type="plt_path",
                                             max_depth=2)), k0


def test_friis_free_space_absolute_level():
    from wave_tracer_tpu.render import render_scene
    from wave_tracer_tpu.scene.build import build_scene

    res, extent, d, I = 32, 4.0, 10.0, 7.0
    scene, k0 = _free_space_scene(res, extent, d, I)
    built = build_scene(scene)
    img, stats = render_scene(built, spp=192, batch_lanes=1 << 13)
    V = np.asarray(img[..., 0])
    assert np.isfinite(V).all()

    xs = (np.arange(res) + 0.5) / res * extent - extent / 2
    X, Y = np.meshgrid(xs, xs)
    E = I * d / (d * d + X ** 2 + Y ** 2) ** 1.5
    pred = res * res / math.pi * E

    # global absolute level (total power through the window)
    ratio = V.sum() / pred.sum()
    assert abs(ratio - 1.0) < 0.04, f"absolute level ratio {ratio}"
    # radial profile: annulus means match the 1/r³ falloff
    rho = np.sqrt(X ** 2 + Y ** 2)
    for r0, r1 in [(0.0, 0.7), (0.7, 1.4), (1.4, 2.0)]:
        sel = (rho >= r0) & (rho < r1)
        rr = V[sel].mean() / pred[sel].mean()
        assert abs(rr - 1.0) < 0.08, f"annulus [{r0},{r1}) ratio {rr}"
    # dB map offset: dB(V) = dB(E) + 10·log10(WH/π) exactly
    off = 10 * np.log10(res * res / math.pi)
    db_meas = 10 * np.log10(np.maximum(V.sum() / V.size, 1e-30))
    db_pred = 10 * np.log10(E.mean()) + off
    assert abs(db_meas - db_pred) < 0.2, "dB calibration offset"


def test_friis_distance_scaling():
    """Doubling the distance must cost exactly 6.02 dB (free-space path
    loss ∝ 1/d²) — the Friis law through the full forward pipeline."""
    from wave_tracer_tpu.render import render_scene
    from wave_tracer_tpu.scene.build import build_scene

    levels = []
    for d in (10.0, 20.0):
        scene, _ = _free_space_scene(res=24, extent=2.0, d=d, I=5.0)
        built = build_scene(scene)
        img, _ = render_scene(built, spp=256, batch_lanes=1 << 13)
        levels.append(np.asarray(img[..., 0]).mean())
    db_drop = 10 * np.log10(levels[0] / levels[1])
    assert abs(db_drop - 20 * np.log10(2.0)) < 0.35, \
        f"distance-doubling loss {db_drop:.2f} dB (want 6.02)"


def test_double_slit_absolute_level_vs_kirchhoff():
    """Absolute fringe-level calibration of the forward Fraunhofer path
    against a numerical Fresnel–Kirchhoff oracle.

    Oracle: 2D Kirchhoff integral over the OPEN regions of the
    double_slits screen (slits [0.15,0.5]/[−0.5,−0.15] mm plus the
    |x|>6 mm outer gaps), illuminated by the renderer's actual source
    beam — the minimum-uncertainty Gaussian the spot emitter sources
    (σ_I ≈ 3.99 mm at the screen; 10.3 mm spatial envelope at the
    source — a 0.1° coherent beam at λ=50 µm CANNOT be narrower), with
    the spherical curvature of the 485 mm throw. Values below were
    computed with /‌tmp-grade quadrature (dx≈0.01 mm, dy=0.008 mm,
    phase-resolved; script archived in docs/diffraction_calibration.md).

    What the model reproduces (validated): the central-lobe absolute
    level within ±30%, the total transmitted fraction (≈0.17 vs the
    oracle's Gaussian open-mass 0.2), and the first fringe
    minimum/revival positions (≈2.5 mm / ≈4.5 mm at 65 mm throw ⇒
    Δx = λL/W with W=0.65 mm slit separation). The round-5
    flux-consistent partition closed the earlier 0.38×/0.05 deficits:
    lanes whose central ray hits a region triangle now branch into the
    ASF redirect with probability (1 − blocked) at full weight, so the
    ensemble transmits exactly E[1 − blocked] per beam — the reference
    partitions by where the beam AXIS lands instead
    (plt_bdpt_detail.hpp:494-512), making its transmitted power follow
    the emitter-cone aiming distribution. Remaining deficit: the first
    fringe minimum is shallower than the oracle's (RIS-winner washout
    at M=32) and far revivals run low.
    """
    import jax.numpy as jnp
    from wave_tracer_tpu.render import render_scene
    from wave_tracer_tpu.scene.build import build_scene
    from wave_tracer_tpu.scene.xml import load_scene_xml

    RES = 256

    def render(screen):
        scene = load_scene_xml(
            "/root/reference/scenes/diffraction_simple/double_slits.xml",
            {"pattern": "true", "res": str(RES), "spp": "4",
             "screen": "true" if screen else "false"})
        built = build_scene(scene)
        img, _ = render_scene(built, spp=4, batch_lanes=1 << 13, seed=0)
        return np.asarray(img[..., 0])

    pat = render(True)
    free = render(False)
    assert np.isfinite(pat).all() and np.isfinite(free).all()
    H, W = pat.shape
    xs = (np.arange(W) + 0.5) / W * 250.0 - 125.0
    row = pat[H // 2 - 2:H // 2 + 2].mean(axis=0)
    f0 = free[H // 2 - 2:H // 2 + 2].mean(axis=0)[np.abs(xs) < 1.2].max()
    assert f0 > 0

    def band(lo, hi):
        sel = (np.abs(xs) >= lo) & (np.abs(xs) < hi)
        return row[sel].mean() / f0

    # Gaussian-beam Kirchhoff oracle band means (see docstring)
    K_CENTER = 0.116          # |x| < 1.5 mm
    K_REV = 0.046             # 4.0 ≤ |x| < 5.0 (first revival)
    c = band(0.0, 1.5)
    dip = band(2.2, 2.7)
    rev = band(4.0, 5.0)
    # absolute central level within ±30% of Kirchhoff (round-4 bar was
    # a factor 2.5; the flux-consistent partition closed it)
    assert K_CENTER / 1.3 < c < K_CENTER * 1.3, \
        f"central band {c} vs Kirchhoff {K_CENTER}"
    # total transmitted power ≈ the oracle's Gaussian open-mass (0.2);
    # the remainder sits in wide angles past the pattern window
    trans = pat.sum() / max(free.sum(), 1e-30)
    assert 0.10 < trans < 0.30, \
        f"transmitted fraction {trans} vs Kirchhoff ~0.2"
    # interference structure: the first minimum is a real dip relative
    # to both neighbours (fringe spacing λL/W = 5 mm)
    assert dip < 0.6 * c, f"no central-to-dip falloff ({dip} vs {c})"
    assert dip < rev * 1.5, f"first revival not above the dip " \
        f"({rev} vs {dip})"
    # absolute revival level within a factor 3 (was: order of magnitude)
    assert K_REV / 3.0 < rev < K_REV * 3.0, \
        f"revival band {rev} vs {K_REV}"
