from wave_tracer_tpu.integrator.path import trace_paths  # noqa: F401
