from wave_tracer_tpu.sensor.film import Film, develop, splat  # noqa: F401
from wave_tracer_tpu.sensor.response import Response  # noqa: F401
from wave_tracer_tpu.sensor.perspective import PerspectiveSensor  # noqa: F401
