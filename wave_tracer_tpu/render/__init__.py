from wave_tracer_tpu.render.renderer import Renderer, render_scene  # noqa: F401
