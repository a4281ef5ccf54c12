"""A/B the MXU intersector's matmul precision on the real TPU.

HIGHEST = 6 bf16 passes (near-f64 products), HIGH = 3 passes (~f32).
Prints per-mode trace times and hit-set agreement on the cornell box.
Run twice: WT_MXU_PRECISION=highest (default) then =high; or use the
in-process comparison below (rebuilds the launch fn per precision).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from wave_tracer_tpu.accel import mxu_trace, trace as trace_mod
    from wave_tracer_tpu.sampling import rng
    from wave_tracer_tpu.scene import build_scene
    from wave_tracer_tpu.scene.xml import load_scene_xml

    print("devices:", jax.devices(), flush=True)
    scene = load_scene_xml("/root/reference/scenes/cornell-box/box.xml",
                           {"res": "256", "spp": "16"})
    built = build_scene(scene)
    data = built.data.replace(spectral=built.spectral_per_sensor[0])
    sensor = scene.sensors[0]
    geo = data.geo

    N = 1 << 14
    pix = jnp.arange(N, dtype=jnp.int32) % (sensor.width * sensor.height)
    pxy = jnp.stack([pix % sensor.width, pix // sensor.width], axis=-1)
    jitter = jnp.full((N, 2), 0.5, jnp.float32)
    ro, rd, _ = sensor.generate_rays(pxy, jitter)
    tmin = jnp.full((N,), 1e-4)
    tmax = jnp.full((N,), 1e30)

    results = {}
    for prec in ("highest", "high"):
        mxu_trace._PRECISION = {
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST}[prec]
        # fresh jit cache per precision (the constant is baked in)
        launch = jax.jit(mxu_trace._launch.__wrapped__,
                         static_argnames=("anyhit",))

        def tr(ro, rd):
            NP = ((N + mxu_trace.BN - 1) // mxu_trace.BN) * mxu_trace.BN
            rf = mxu_trace._ray_features(ro, rd, geo.mxu_center)
            rf = mxu_trace._pad_rays(rf, NP - N)
            aux = jnp.stack([tmin, tmax, jnp.full((N,), -1.0),
                             jnp.full((N,), -2.0)], axis=-1)
            aux = mxu_trace._pad_rays(aux, NP - N, fill=-3.0)
            return launch(geo.tri_mxu, rf, aux, False)[:N]

        f = jax.jit(tr)
        out = f(ro, rd)
        jax.block_until_ready(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = f(ro, rd)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        results[prec] = (min(ts), np.asarray(out))
        print(f"PROBE trace_{prec} {min(ts):.4f}", flush=True)

    t_hi, o_hi = results["highest"]
    t_lo, o_lo = results["high"]
    same_tri = (o_hi[:, 1] == o_lo[:, 1])
    dt = np.abs(o_hi[:, 0] - o_lo[:, 0])
    dt = dt[np.isfinite(o_hi[:, 0]) & (o_hi[:, 0] < 1e30)]
    print(f"hit-tri agreement: {same_tri.mean()*100:.3f}%", flush=True)
    print(f"t diff: max {dt.max():.3e} mean {dt.mean():.3e}", flush=True)
    print(f"speedup: {t_hi/t_lo:.2f}x", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
