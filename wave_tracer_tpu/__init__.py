"""wave_tracer_tpu — a TPU-native, differentiable wave-optical path tracer.

A brand-new JAX/XLA/Pallas framework with the capabilities of the C++ CPU
renderer `ssteinberg/wave_tracer` (studied at /root/reference): path tracing of
elliptical cone beams as geometric proxies for Gaussian light beams, coherent
free-space edge diffraction (UTD and Fraunhofer), polarimetric Stokes/Mueller
transport, wave-aware surface-profile BSDFs, spectral sampling, and
complex-amplitude sensor splatting with interference.

Architecture (TPU-first, not a port):
  * All hot paths are wavefront kernels over SoA beam queues (arrays of
    structures-of-arrays, registered pytrees) executed under `jax.jit`;
    recursion in the reference becomes a bounded `lax.fori_loop` with active
    masks, thread-local buffers become fixed-capacity top-K lanes.
  * The 8-wide AVX SIMD engine of the reference disappears: batching is the
    leading array dimension of every kernel (sublane x lane tiles).
  * Scale-out is data parallelism over beams/samples via `shard_map` on a
    `jax.sharding.Mesh`; per-chip partial films are merged with `psum`.
  * Differentiability: the radiometric path (BSDFs, spectra, emitters,
    responses) is pure JAX; discrete decisions (BVH traversal, RR, lobe
    selection) are detached.

Unit conventions (replacing the reference's mp-units compile-time dimensions,
cf. reference include/wt/math/quantity/defs.hpp):
  * lengths in metres (f32)
  * angles in radians
  * wavenumber k = 2*pi/lambda in rad/m
  * radiometric quantities in SI (W, W/sr, W/sr/m^2)
"""

__version__ = "0.1.0"

from wave_tracer_tpu.core import quantity, expr  # noqa: F401
