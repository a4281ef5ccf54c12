from wave_tracer_tpu.parallel.dist import (  # noqa: F401
    make_mesh, sharded_render_step)
