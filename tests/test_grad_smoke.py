"""Fast differentiability smoke: gradient flows through one bounce.

(The full finite-difference validation lives in test_gradients.py behind
WT_SLOW_TESTS; this keeps a cheap always-on check that jax.grad works
through the transport.)"""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_render import make_box_scene
from wave_tracer_tpu.integrator.path import trace_paths
from wave_tracer_tpu.sampling import rng
from wave_tracer_tpu.scene import build_scene


def test_grad_nonzero_one_bounce():
    scene = make_box_scene(res=4, spp=1)
    built = build_scene(scene)
    sensor = scene.sensors[0]
    N = 16
    pix = jnp.arange(N, dtype=jnp.int32) % 16
    pxy = jnp.stack([pix % 4, pix // 4], axis=-1)
    jitter = jnp.full((N, 2), 0.5)
    sids = jnp.zeros((N,), jnp.int32)
    key = rng.make_base_key(0)

    def loss(theta):
        st = built.data.tables.spectra
        data = built.data.replace(
            tables=built.data.tables.replace(
                spectra=st.replace(vals=st.vals * theta)))
        _, values, _ = trace_paths(data, pxy, jitter, key, sids,
                                   sensor=sensor, max_depth=2, eps=1e-4)
        return jnp.mean(values)

    g = jax.grad(loss)(1.0)
    assert np.isfinite(float(g)) and float(g) > 0.0
