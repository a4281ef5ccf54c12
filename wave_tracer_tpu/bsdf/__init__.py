from wave_tracer_tpu.bsdf.model import (  # noqa: F401
    CompositeBSDF, DielectricBSDF, DiffuseBSDF, Material, SpmBSDF,
    SurfaceProfile)
from wave_tracer_tpu.bsdf.table import MaterialTable, bake_materials  # noqa: F401
