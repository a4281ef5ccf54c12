from wave_tracer_tpu.spectrum.spectra import (  # noqa: F401
    Spectrum, UniformSpectrum, PiecewiseLinearSpectrum, BlackbodySpectrum,
    GaussianSpectrum, DiscreteSpectrum, RGBSpectrum, AnalyticSpectrum,
    BinnedSpectrum, CompositeSpectrum, ComplexUniformSpectrum,
    ComplexTabulatedSpectrum, K_VISIBLE_MIN, K_VISIBLE_MAX,
    wavelength_to_wavenumber, wavenumber_to_wavelength,
)
