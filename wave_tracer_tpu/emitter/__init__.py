from wave_tracer_tpu.emitter.model import (  # noqa: F401
    AreaEmitter, DirectionalEmitter, Emitter, PointEmitter, SpotEmitter)
from wave_tracer_tpu.emitter.table import (  # noqa: F401
    EmitterTable, bake_emitters, emission_radiance, pdf_direct_solid_angle,
    sample_direct, sample_emission)
