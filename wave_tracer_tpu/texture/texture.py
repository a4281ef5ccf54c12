"""Textures: host-side model + baked device atlas.

Mirrors the reference texture inventory (reference include/wt/texture/
texture.hpp:43-92; bitmap, checkerboard, constant, mix, scale, ...) with a
TPU-first representation: all bitmap textures are packed into one padded
atlas array so a batched bilinear lookup is a single gather; constant and
procedural textures evaluate as pure math. A texture evaluates either to
RGB (for display responses) or to a scalar spectral value at wavenumber k
(RGB texels are uplifted through the Smits basis on device).

Wrapper textures (scale) are flattened into per-texture scalar/spectral
multipliers at bake time rather than kept as a tree.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax.numpy as jnp
from flax import struct

from wave_tracer_tpu.spectrum.bake import SpectrumTable, smits_uplift_dev
from wave_tracer_tpu.spectrum.spectra import Spectrum

TYPE_CONST_SPECTRUM = 0
TYPE_CONST_RGB = 1
TYPE_BITMAP = 2
TYPE_CHECKERBOARD = 3


class Texture:
    """Host-side texture node."""
    scale_spectrum: Optional[Spectrum] = None
    scale: float = 1.0


@dataclass
class ConstantSpectrumTexture(Texture):
    spectrum: Spectrum
    scale: float = 1.0
    scale_spectrum: Optional[Spectrum] = None


@dataclass
class ConstantRGBTexture(Texture):
    rgb: tuple
    scale: float = 1.0
    scale_spectrum: Optional[Spectrum] = None


@dataclass
class BitmapTexture(Texture):
    """Image-backed texture; data (H, W, 3) float in linear space."""
    data: np.ndarray
    uv_scale: tuple = (1.0, 1.0)
    uv_offset: tuple = (0.0, 0.0)
    scale: float = 1.0
    scale_spectrum: Optional[Spectrum] = None


@dataclass
class CheckerboardTexture(Texture):
    rgb_a: tuple = (0.4, 0.4, 0.4)
    rgb_b: tuple = (0.2, 0.2, 0.2)
    uv_scale: tuple = (1.0, 1.0)
    uv_offset: tuple = (0.0, 0.0)
    scale: float = 1.0
    scale_spectrum: Optional[Spectrum] = None


MAX_MIPS = 8


@struct.dataclass
class TextureTable:
    type: jnp.ndarray        # (T,) i32
    spec_id: jnp.ndarray     # (T,) i32 — constant-spectrum id (or -1)
    sscale_id: jnp.ndarray   # (T,) i32 — scale-spectrum id (or -1)
    rgb: jnp.ndarray         # (T, 3)
    rgb2: jnp.ndarray        # (T, 3)
    uv_xform: jnp.ndarray    # (T, 4) scale.xy, offset.xy
    scale: jnp.ndarray       # (T,)
    atlas_slot: jnp.ndarray  # (T,) i32 (or -1)
    # mip pyramid packed along x: level 0 at x=0 (w), level L at
    # x = ox_L (w/2^L) — (A, HMAX, 2*WMAX, 3); box-filtered downsamples
    # (the reference builds avir-resampled mipmaps, texture2d.hpp)
    atlas: jnp.ndarray       # (A, HMAX, 2*WMAX, 3)
    atlas_size: jnp.ndarray  # (A, 2) i32 (h, w) of level 0
    mip_info: jnp.ndarray    # (A, MAX_MIPS, 3) i32: ox, h, w per level
    n_mips: jnp.ndarray      # (A,) i32
    pack: jnp.ndarray        # (T, 16): type spec sscale rgb3 rgb2_3
                             # uv_xform4 scale atlas_slot — one row
                             # gather per texture eval


def bake_textures(textures: list[Texture],
                  spectrum_ids: dict[int, int]) -> TextureTable:
    """Pack host textures. spectrum_ids maps id(spectrum obj) → baked row."""
    T = max(len(textures), 1)
    typ = np.zeros(T, np.int32)
    spec_id = np.full(T, -1, np.int32)
    sscale_id = np.full(T, -1, np.int32)
    rgb = np.ones((T, 3), np.float32)
    rgb2 = np.zeros((T, 3), np.float32)
    uvx = np.tile(np.array([1, 1, 0, 0], np.float32), (T, 1))
    scale = np.ones(T, np.float32)
    slots = np.full(T, -1, np.int32)

    bitmaps = [t for t in textures if isinstance(t, BitmapTexture)]
    if bitmaps:
        hmax = max(b.data.shape[0] for b in bitmaps)
        wmax = max(b.data.shape[1] for b in bitmaps)
        atlas = np.zeros((len(bitmaps), hmax, 2 * wmax, 3), np.float32)
        sizes = np.zeros((len(bitmaps), 2), np.int32)
        mip_info = np.zeros((len(bitmaps), MAX_MIPS, 3), np.int32)
        n_mips = np.zeros(len(bitmaps), np.int32)
        for a, b in enumerate(bitmaps):
            img = np.asarray(b.data[..., :3], np.float32)
            h, w = img.shape[:2]
            sizes[a] = (h, w)
            ox = 0
            for lvl in range(MAX_MIPS):
                lh, lw = img.shape[:2]
                atlas[a, :lh, ox:ox + lw] = img
                mip_info[a, lvl] = (ox, lh, lw)
                n_mips[a] = lvl + 1
                if lh <= 1 and lw <= 1:
                    break
                # 2x2 box downsample (pad odd dims by edge replication)
                if lh % 2:
                    img = np.concatenate([img, img[-1:]], axis=0)
                if lw % 2:
                    img = np.concatenate([img, img[:, -1:]], axis=1)
                img = 0.25 * (img[0::2, 0::2] + img[1::2, 0::2]
                              + img[0::2, 1::2] + img[1::2, 1::2])
                ox += lw
            # unfilled deeper levels repeat the last one
            for lvl in range(n_mips[a], MAX_MIPS):
                mip_info[a, lvl] = mip_info[a, n_mips[a] - 1]
    else:
        atlas = np.zeros((1, 1, 2, 3), np.float32)
        sizes = np.ones((1, 2), np.int32)
        mip_info = np.zeros((1, MAX_MIPS, 3), np.int32)
        mip_info[..., 1:] = 1
        n_mips = np.ones(1, np.int32)

    slot_of = {id(b): a for a, b in enumerate(bitmaps)}
    for i, t in enumerate(textures):
        scale[i] = t.scale
        if t.scale_spectrum is not None:
            sscale_id[i] = spectrum_ids[id(t.scale_spectrum)]
        if isinstance(t, ConstantSpectrumTexture):
            typ[i] = TYPE_CONST_SPECTRUM
            spec_id[i] = spectrum_ids[id(t.spectrum)]
        elif isinstance(t, ConstantRGBTexture):
            typ[i] = TYPE_CONST_RGB
            rgb[i] = t.rgb
        elif isinstance(t, BitmapTexture):
            typ[i] = TYPE_BITMAP
            slots[i] = slot_of[id(t)]
            uvx[i] = (*t.uv_scale, *t.uv_offset)
        elif isinstance(t, CheckerboardTexture):
            typ[i] = TYPE_CHECKERBOARD
            rgb[i] = t.rgb_a
            rgb2[i] = t.rgb_b
            uvx[i] = (*t.uv_scale, *t.uv_offset)
        else:
            raise TypeError(f"unsupported texture {type(t)}")

    pack = np.zeros((T, 16), np.float32)
    pack[:, 0] = typ
    pack[:, 1] = spec_id
    pack[:, 2] = sscale_id
    pack[:, 3:6] = rgb
    pack[:, 6:9] = rgb2
    pack[:, 9:13] = uvx
    pack[:, 13] = scale
    pack[:, 14] = slots
    return TextureTable(
        pack=jnp.asarray(pack),
        type=jnp.asarray(typ), spec_id=jnp.asarray(spec_id),
        sscale_id=jnp.asarray(sscale_id), rgb=jnp.asarray(rgb),
        rgb2=jnp.asarray(rgb2), uv_xform=jnp.asarray(uvx),
        scale=jnp.asarray(scale), atlas_slot=jnp.asarray(slots),
        atlas=jnp.asarray(atlas), atlas_size=jnp.asarray(sizes),
        mip_info=jnp.asarray(mip_info), n_mips=jnp.asarray(n_mips))


def _bilinear_level(table: TextureTable, slot, u, v, level):
    """Bilinear fetch at one mip level (uv wraps/repeat)."""
    info = table.mip_info[slot, level]            # (..., 3) ox, h, w
    ox = info[..., 0]
    hi = info[..., 1]
    wi = info[..., 2]
    h = hi.astype(jnp.float32)
    w = wi.astype(jnp.float32)
    # image row 0 is the top; v=0 is the bottom of the texture
    x = (u % 1.0) * w - 0.5
    y = (1.0 - (v % 1.0)) * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def tex(yy, xx):
        yy = jnp.clip(yy.astype(jnp.int32) % jnp.maximum(hi, 1), 0,
                      table.atlas.shape[1] - 1)
        xx = ox + xx.astype(jnp.int32) % jnp.maximum(wi, 1)
        xx = jnp.clip(xx, 0, table.atlas.shape[2] - 1)
        return table.atlas[slot, yy, xx]

    fx = fx[..., None]
    fy = fy[..., None]
    return ((1 - fx) * (1 - fy) * tex(y0, x0) + fx * (1 - fy) * tex(y0, x0 + 1)
            + (1 - fx) * fy * tex(y0 + 1, x0) + fx * fy * tex(y0 + 1, x0 + 1))


def _bilinear(table: TextureTable, slot, u, v, duv=None):
    """Filtered atlas fetch: trilinear across the box-filtered mip
    pyramid when a uv-space footprint diameter `duv` is given (reference
    texture2d mipmapped lookups), plain level-0 bilinear otherwise."""
    slot = jnp.maximum(slot, 0)
    if duv is None:
        return _bilinear_level(table, slot, u, v,
                               jnp.zeros_like(slot))
    w0 = table.atlas_size[slot, 1].astype(jnp.float32)
    lod = jnp.log2(jnp.maximum(duv * w0, 1.0))
    nmax = (table.n_mips[slot] - 1).astype(jnp.float32)
    lod = jnp.clip(lod, 0.0, nmax)
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, nmax.astype(jnp.int32))
    f = (lod - l0.astype(jnp.float32))[..., None]
    return (1.0 - f) * _bilinear_level(table, slot, u, v, l0) \
        + f * _bilinear_level(table, slot, u, v, l1)


def _eval_rgb_row(table: TextureTable, row, uv, duv=None):
    """RGB value from a packed texture row (one gather done by caller)."""
    typ = row[..., 0].astype(jnp.int32)
    u = uv[..., 0] * row[..., 9] + row[..., 11]
    v = uv[..., 1] * row[..., 10] + row[..., 12]
    if duv is not None:
        duv = duv * jnp.maximum(jnp.abs(row[..., 9]),
                                jnp.abs(row[..., 10]))
    bitmap = _bilinear(table, row[..., 14].astype(jnp.int32), u, v, duv)
    checker = jnp.where(
        (((jnp.floor(u) + jnp.floor(v)) % 2.0) < 1.0)[..., None],
        row[..., 3:6], row[..., 6:9])
    out = jnp.where((typ == TYPE_BITMAP)[..., None], bitmap,
                    jnp.where((typ == TYPE_CHECKERBOARD)[..., None],
                              checker, row[..., 3:6]))
    return out * row[..., 13:14]


def eval_texture_rgb(table: TextureTable, spec_table: SpectrumTable,
                     tex_id, uv, duv=None):
    """RGB value of texture tex_id (...,) at uv (..., 2) → (..., 3).
    duv: optional uv-space footprint diameter for mip filtering."""
    row = table.pack[jnp.maximum(tex_id, 0)]
    return _eval_rgb_row(table, row, uv, duv)


def eval_texture_scalar(table: TextureTable, spec_table: SpectrumTable,
                        tex_id, uv, k, duv=None):
    """Scalar spectral value of texture tex_id at uv and wavenumber k.

    RGB-typed texels are uplifted through the Smits basis; constant-spectrum
    textures evaluate their baked spectrum (reference texture_t::f,
    texture.hpp:43-92). ONE packed row gather serves the whole eval;
    duv selects the mip level (trilinear) when given."""
    row = table.pack[jnp.maximum(tex_id, 0)]
    typ = row[..., 0].astype(jnp.int32)
    scale = row[..., 13]
    rgbv = _eval_rgb_row(table, row, uv, duv) \
        / jnp.maximum(scale[..., None], 1e-30)
    from_rgb = smits_uplift_dev(rgbv, k)
    from_spec = spec_table.eval(row[..., 1].astype(jnp.int32), k)
    out = jnp.where(typ == TYPE_CONST_SPECTRUM, from_spec, from_rgb)
    out = out * scale
    sscale_id = row[..., 2].astype(jnp.int32)
    sscale = jnp.where(sscale_id >= 0,
                       spec_table.eval(sscale_id, k), 1.0)
    return out * sscale
