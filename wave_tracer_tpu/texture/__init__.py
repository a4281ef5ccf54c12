from wave_tracer_tpu.texture.texture import (  # noqa: F401
    BitmapTexture, CheckerboardTexture, ConstantRGBTexture,
    ConstantSpectrumTexture, Texture, TextureTable, bake_textures,
    eval_texture_rgb, eval_texture_scalar)
