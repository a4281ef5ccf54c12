from wave_tracer_tpu.wave.cone import Cone  # noqa: F401
from wave_tracer_tpu.wave import beam  # noqa: F401
