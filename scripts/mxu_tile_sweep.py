"""Sweep the MXU intersector tile shape (BN x BT) on the real TPU.

Runs each combo in a SUBPROCESS (BN/BT are module constants baked into
the Pallas kernel at import). Prints seconds per closest-hit trace at
16k rays over the cornell-box triangles, measured inside a fori(8) loop
(the deployment shape).
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COMBOS = [(256, 512), (512, 512), (256, 1024), (512, 1024), (1024, 512),
          (128, 2048), (256, 2048), (1024, 1024)]


def child():
    import time
    import jax
    import jax.numpy as jnp
    from wave_tracer_tpu.accel import trace as trace_mod, mxu_trace
    from wave_tracer_tpu.scene import build_scene
    from wave_tracer_tpu.scene.xml import load_scene_xml

    scene = load_scene_xml("/root/reference/scenes/cornell-box/box.xml",
                           {"res": "256", "spp": "16"})
    built = build_scene(scene)
    data = built.data.replace(spectral=built.spectral_per_sensor[0])
    sensor = scene.sensors[0]
    geo = data.geo
    N = 1 << 14
    pix = jnp.arange(N, dtype=jnp.int32) % (sensor.width * sensor.height)
    pxy = jnp.stack([pix % sensor.width, pix // sensor.width], axis=-1)
    ro, rd, _ = sensor.generate_rays(pxy, jnp.full((N, 2), 0.5))
    eps = 1e-4 * scene.world_radius()

    @jax.jit
    def tr8(ro, rd):
        def body(i, c):
            ro, rd, acc = c
            t, tri, uu, vv = mxu_trace.trace_mxu(
                geo, ro, rd, jnp.full((N,), eps), jnp.full((N,), 1e30))
            hit = trace_mod.hit_attributes(geo, ro, rd, t, tri, uu, vv)
            ro = jnp.where(hit.valid[:, None], hit.p + eps * hit.ns, ro)
            rd = jnp.where(hit.valid[:, None],
                           rd - 2.0 * jnp.sum(rd * hit.ns, -1,
                                              keepdims=True) * hit.ns, rd)
            return ro, rd, acc + t
        return jax.lax.fori_loop(0, 8, body, (ro, rd, jnp.zeros((N,))))[2]

    out = tr8(ro, rd)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = tr8(ro, rd)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"RESULT {min(ts)/8:.5f}", flush=True)


def main():
    for bn, bt in COMBOS:
        env = dict(os.environ, WT_MXU_BN=str(bn), WT_MXU_BT=str(bt))
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                env=env, capture_output=True, text=True, timeout=900)
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("RESULT")]
            res = line[0].split()[1] if line else f"FAIL rc={out.returncode}"
        except subprocess.TimeoutExpired:
            res = "TIMEOUT"
        print(f"BN={bn} BT={bt}: {res} s/trace", flush=True)


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        main()
