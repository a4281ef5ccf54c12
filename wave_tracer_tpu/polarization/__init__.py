from wave_tracer_tpu.polarization import fresnel, mueller, stokes  # noqa: F401
