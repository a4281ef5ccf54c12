from wave_tracer_tpu.scene.model import (IntegratorConfig, Scene,  # noqa: F401
                                         Shape)
from wave_tracer_tpu.scene.build import SceneData, build_scene  # noqa: F401
