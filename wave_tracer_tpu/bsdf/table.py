"""Device material table: flattened SoA arrays for branch-free dispatch."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from wave_tracer_tpu.bsdf import model, profiles

MT_DIFFUSE = 0
MT_DIELECTRIC = 1
MT_SPM = 2
MT_NULL = 3

MAX_COMPOSITE_BINS = 4


@struct.dataclass
class MaterialTable:
    mtype: jnp.ndarray         # (M,) i32
    twosided: jnp.ndarray      # (M,) bool
    scale: jnp.ndarray         # (M,)
    refl_tex: jnp.ndarray      # (M,) i32 reflectance texture (-1 none)
    opacity_tex: jnp.ndarray   # (M,) i32 (-1 none)
    normalmap_tex: jnp.ndarray  # (M,) i32 (-1 none)
    ior_id: jnp.ndarray        # (M,) i32 complex-spectrum row (-1 → η=1)
    ext_ior_id: jnp.ndarray    # (M,) i32 (-1 → vacuum)
    rscale_spec: jnp.ndarray   # (M,) i32 reflectivity-scale spectrum (-1 → 1)
    tscale_spec: jnp.ndarray   # (M,) i32 transmissivity-scale spectrum
    prof_type: jnp.ndarray     # (M,) i32 (profiles.PROFILE_*)
    prof_gamma: jnp.ndarray    # (M,)
    prof_rough_tex: jnp.ndarray  # (M,) i32 roughness texture (-1 → direct)
    prof_T: jnp.ndarray        # (M,) direct T [mm²] (gauss: 1/σ²)
    prof_sigmah: jnp.ndarray   # (M,) direct σ_h [1/mm]
    comp_child: jnp.ndarray    # (M, B) i32 composite children (-1 unused)
    comp_kmin: jnp.ndarray     # (M, B)
    comp_kmax: jnp.ndarray     # (M, B)
    pack: jnp.ndarray          # (M, 16) all scalar fields as f32 — ONE
                               # row gather feeds the whole BSDF dispatch
                               # (gathers have a large fixed cost on this
                               # backend; see accel/trace.py GeoArrays)

    # pack column indices
    C_MTYPE, C_TWOSIDED, C_SCALE, C_REFL_TEX, C_OPACITY_TEX, \
        C_NORMALMAP_TEX, C_IOR, C_EXT_IOR, C_RSCALE, C_TSCALE, \
        C_PROF_TYPE, C_PROF_GAMMA, C_PROF_ROUGH_TEX, C_PROF_T, \
        C_PROF_SIGMAH = range(15)

    @property
    def count(self):
        return self.mtype.shape[0]

    def resolve(self, mat_id, k):
        """Resolve composite materials to the child active at wavenumber k
        (reference include/wt/bsdf/composite.hpp band dispatch).
        Row-gathers the bin tables once instead of per bin."""
        mid = jnp.maximum(mat_id, 0)
        child_row = self.comp_child[mid]                # (..., B)
        kmin_row = self.comp_kmin[mid]
        kmax_row = self.comp_kmax[mid]
        hit = (child_row >= 0) & (k[..., None] >= kmin_row) \
            & (k[..., None] < kmax_row)
        first = jnp.argmax(hit, axis=-1)
        child = jnp.take_along_axis(child_row, first[..., None],
                                    axis=-1)[..., 0]
        out = jnp.where(hit.any(axis=-1), child, mid)
        return jnp.where(mat_id < 0, mat_id, out)


def bake_materials(materials: list[model.Material], tex_ids: dict,
                   spec_ids: dict, cspec_ids: dict) -> MaterialTable:
    """Flatten host materials. *_ids map id(host obj) → device row."""
    M = max(len(materials), 1)
    z = np.zeros
    f = np.full
    cols = dict(
        mtype=z(M, np.int32), twosided=z(M, bool),
        scale=np.ones(M, np.float32),
        refl_tex=f(M, -1, np.int32), opacity_tex=f(M, -1, np.int32),
        normalmap_tex=f(M, -1, np.int32), ior_id=f(M, -1, np.int32),
        ext_ior_id=f(M, -1, np.int32), rscale_spec=f(M, -1, np.int32),
        tscale_spec=f(M, -1, np.int32),
        prof_type=z(M, np.int32),
        prof_gamma=np.full(M, 3.0, np.float32),
        prof_rough_tex=f(M, -1, np.int32),
        prof_T=np.ones(M, np.float32), prof_sigmah=z(M, np.float32),
        comp_child=f((M, MAX_COMPOSITE_BINS), -1, np.int32),
        comp_kmin=z((M, MAX_COMPOSITE_BINS), np.float32),
        comp_kmax=z((M, MAX_COMPOSITE_BINS), np.float32),
    )
    mat_row = {id(m): i for i, m in enumerate(materials)}

    for i, m in enumerate(materials):
        cols["twosided"][i] = m.twosided
        cols["scale"][i] = m.scale
        if m.opacity is not None:
            cols["opacity_tex"][i] = tex_ids[id(m.opacity)]
        if m.normalmap is not None:
            cols["normalmap_tex"][i] = tex_ids[id(m.normalmap)]
        b = m.bsdf
        if isinstance(b, model.DiffuseBSDF):
            cols["mtype"][i] = MT_DIFFUSE
            cols["refl_tex"][i] = tex_ids[id(b.reflectance)]
        elif isinstance(b, (model.DielectricBSDF, model.SpmBSDF)):
            cols["mtype"][i] = (MT_DIELECTRIC
                                if isinstance(b, model.DielectricBSDF)
                                else MT_SPM)
            cols["ior_id"][i] = cspec_ids[id(b.ior)]
            if b.ext_ior is not None:
                cols["ext_ior_id"][i] = cspec_ids[id(b.ext_ior)]
            if b.reflection_scale is not None:
                cols["rscale_spec"][i] = spec_ids[id(b.reflection_scale)]
            if b.transmission_scale is not None:
                cols["tscale_spec"][i] = spec_ids[id(b.transmission_scale)]
            if isinstance(b, model.SpmBSDF):
                p = b.profile
                cols["prof_type"][i] = {
                    "dirac": profiles.PROFILE_DIRAC,
                    "gaussian": profiles.PROFILE_GAUSSIAN,
                    "fractal": profiles.PROFILE_FRACTAL}[p.type]
                cols["prof_gamma"][i] = p.gamma
                if p.roughness is not None:
                    cols["prof_rough_tex"][i] = tex_ids[id(p.roughness)]
                if p.T is not None:
                    cols["prof_T"][i] = p.T
                elif p.sigma is not None:
                    cols["prof_T"][i] = 1.0 / max(p.sigma ** 2, 1e-12)
                if p.sigma is not None:
                    cols["prof_sigmah"][i] = p.sigma
        elif isinstance(b, model.CompositeBSDF):
            cols["mtype"][i] = MT_NULL  # outside all bins: no interaction
            for bi, (kmin, kmax, child) in enumerate(
                    b.bins[:MAX_COMPOSITE_BINS]):
                cols["comp_child"][i, bi] = mat_row[id(child)]
                cols["comp_kmin"][i, bi] = kmin
                cols["comp_kmax"][i, bi] = kmax
        elif b is None:
            cols["mtype"][i] = MT_NULL
        else:
            raise TypeError(f"unsupported bsdf {type(b)}")

    pack = np.zeros((M, 16), np.float32)
    order = ("mtype", "twosided", "scale", "refl_tex", "opacity_tex",
             "normalmap_tex", "ior_id", "ext_ior_id", "rscale_spec",
             "tscale_spec", "prof_type", "prof_gamma", "prof_rough_tex",
             "prof_T", "prof_sigmah")
    for ci, name in enumerate(order):
        pack[:, ci] = cols[name].astype(np.float32)
    return MaterialTable(pack=jnp.asarray(pack),
                         **{k: jnp.asarray(v) for k, v in cols.items()})
