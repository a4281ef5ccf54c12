"""Texture mip pyramid + trilinear filtered lookups (reference
texture2d.hpp mipmaps / avir resampling; box-filter pyramid here)."""

import numpy as np
import jax.numpy as jnp

from wave_tracer_tpu.texture.texture import (BitmapTexture, MAX_MIPS,
                                             bake_textures,
                                             eval_texture_rgb)


def _checker(n):
    y, x = np.mgrid[0:n, 0:n]
    c = ((x // 1 + y // 1) % 2).astype(np.float32)
    return np.stack([c, c, c], axis=-1)


def test_pyramid_levels_and_means():
    tex = BitmapTexture(data=_checker(64))
    table = bake_textures([tex], {})
    assert int(table.n_mips[0]) == 7          # 64 → 1
    # every level preserves the mean (box filter)
    for lvl in range(int(table.n_mips[0])):
        ox, h, w = [int(v) for v in np.asarray(table.mip_info[0, lvl])]
        block = np.asarray(table.atlas[0, :h, ox:ox + w])
        np.testing.assert_allclose(block.mean(), 0.5, atol=1e-6)
    # deepest level is the global mean
    ox, h, w = [int(v) for v in np.asarray(table.mip_info[0, -1])]
    assert (h, w) == (1, 1)


def test_trilinear_converges_to_mean_at_large_footprint():
    tex = BitmapTexture(data=_checker(64))
    table = bake_textures([tex], {})
    # texel centres (bilinear between alternating texels would blur)
    uv = jnp.asarray([[(8 + 0.5) / 64, (8 + 0.5) / 64]] * 4)
    tid = jnp.zeros((4,), jnp.int32)
    # tiny footprint: sharp texel values (0 or 1)
    v_sharp = np.asarray(eval_texture_rgb(table, None, tid, uv,
                                          duv=jnp.full((4,), 1e-4)))
    assert (np.abs(v_sharp - 0.5) > 0.45).all()
    # footprint covering the whole texture: the mean
    v_wide = np.asarray(eval_texture_rgb(table, None, tid, uv,
                                         duv=jnp.full((4,), 1.0)))
    np.testing.assert_allclose(v_wide, 0.5, atol=0.02)
    # no-footprint call = level 0 exactly
    v0 = np.asarray(eval_texture_rgb(table, None, tid, uv))
    np.testing.assert_allclose(v0, v_sharp, atol=1e-6)


def test_intermediate_lod_between_levels():
    grad = np.linspace(0, 1, 32, dtype=np.float32)
    img = np.broadcast_to(grad[None, :, None], (32, 32, 3)).copy()
    table = bake_textures([BitmapTexture(data=img)], {})
    uv = jnp.asarray([[0.25, 0.5]])
    tid = jnp.zeros((1,), jnp.int32)
    vals = [float(np.asarray(eval_texture_rgb(
        table, None, tid, uv, duv=jnp.full((1,), d)))[0, 0])
        for d in (1e-4, 0.1, 0.5, 1.0)]
    # smooth gradient: lookups stay finite and move toward the mean
    assert all(np.isfinite(vals))
    assert abs(vals[-1] - 0.5) < 0.05
