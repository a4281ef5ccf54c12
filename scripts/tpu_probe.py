"""TPU perf probe (round 2): where does the classical kernel's time go?

Runs on the real axon TPU chip. Prints one line per measurement:
    PROBE <name> <seconds_per_call> [aux]

Measurements (all at 16k lanes, shapes matching the bench):
  full8        — trace_paths, depth 8 (the bench kernel)
  trace8       — fori(8) over trace+hit_attributes only
  trace1x8     — 8 sequential traces NOT in a fori_loop (scheduling anomaly)
  occl8        — fori(8) over occluded() only
  gather8      — fori(8) over 12 packed-row gathers (64x32 table)
  onehot8      — fori(8) over 12 one-hot matmul "gathers" (same table)
  neeblock8    — fori(8) over the NEE block (sample_direct + eval_f + occl)
  bsdf8        — fori(8) over bsdf sample+compose
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from wave_tracer_tpu.accel import trace as trace_mod
from wave_tracer_tpu.bsdf import device as bsdf_dev
from wave_tracer_tpu.emitter import table as etab
from wave_tracer_tpu.integrator.path import trace_paths, compose_scatter, _perp_axis
from wave_tracer_tpu.math import frame as frame_mod
from wave_tracer_tpu.sampling import rng
from wave_tracer_tpu.scene import build_scene
from wave_tracer_tpu.scene.xml import load_scene_xml

LANES = 1 << 14
DEPTH = 8


def bench(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"PROBE {name} {min(ts):.4f}", flush=True)
    return min(ts)


def main():
    print("devices:", jax.devices(), flush=True)
    scene = load_scene_xml("/root/reference/scenes/cornell-box/box.xml",
                           {"res": "256", "spp": "16"})
    scene.integrator.max_depth = DEPTH
    built = build_scene(scene)
    data = built.data.replace(spectral=built.spectral_per_sensor[0])
    sensor = scene.sensors[0]
    geo = data.geo
    tables = data.tables
    et = data.emitters
    print("tris:", geo.num_tris, flush=True)

    N = LANES
    pix = jnp.arange(N, dtype=jnp.int32) % (sensor.width * sensor.height)
    pxy = jnp.stack([pix % sensor.width, pix // sensor.width], axis=-1)
    jitter = jnp.full((N, 2), 0.5, jnp.float32)
    sids = jnp.zeros((N,), jnp.int32)
    key = rng.make_base_key(0)
    eps = 1e-4 * scene.world_radius()

    # ---- full kernel
    @jax.jit
    def full(data, pxy, jitter, key, sids):
        pos, v, ok = trace_paths(data, pxy, jitter, key, sids,
                                 sensor=sensor, max_depth=DEPTH, eps=eps)
        return v
    t_full = bench("full8", full, data, pxy, jitter, key, sids)
    print(f"paths_per_sec_full {N / t_full:.0f}", flush=True)

    ro0, rd0, _ = sensor.generate_rays(pxy, jitter)
    keys = rng.sample_key(key, pix, sids)
    u = rng.uniform(keys, rng.D_SPECTRUM, 2)
    e0, _ = data.spectral.sample_emitter(u[:, 0])
    k, _ = data.spectral.sample_k(e0, u[:, 1])

    # ---- MXU intersector vs lock-step BVH (single trace, 8 reps)
    from wave_tracer_tpu.accel import mxu_trace

    @jax.jit
    def mxu8(ro, rd):
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
        ro, rd, acc = jax.lax.fori_loop(0, DEPTH, body,
                                        (ro, rd, jnp.zeros((N,))))
        return acc
    bench("mxu8", mxu8, ro0, rd0)

    @jax.jit
    def mxu_occl8(ro, rd):
        def body(i, acc):
            occ = mxu_trace.occluded_mxu(geo, ro, rd,
                                         jnp.full((N,), eps),
                                         jnp.full((N,), 10.0))
            return acc + occ.astype(jnp.float32) + 1e-6 * i
        return jax.lax.fori_loop(0, DEPTH, body, jnp.zeros((N,)))
    bench("mxu_occl8", mxu_occl8, ro0, rd0)

    # ---- trace + attrs in fori
    @jax.jit
    def trace8(ro, rd):
        def body(i, c):
            ro, rd, acc = c
            t, tri, uu, vv = trace_mod.trace_bvh(geo, ro, rd,
                                                 jnp.full((N,), eps),
                                                 jnp.full((N,), 1e30))
            hit = trace_mod.hit_attributes(geo, ro, rd, t, tri, uu, vv)
            # feed outputs back so nothing is dead-code-eliminated
            ro = jnp.where(hit.valid[:, None], hit.p + eps * hit.ns, ro)
            rd = jnp.where(hit.valid[:, None],
                           vec_reflect(rd, hit.ns), rd)
            return ro, rd, acc + t
        def vec_reflect(d, n):
            return d - 2.0 * jnp.sum(d * n, -1, keepdims=True) * n
        ro, rd, acc = jax.lax.fori_loop(0, DEPTH, body, (ro, rd,
                                                         jnp.zeros((N,))))
        return acc
    bench("trace8", trace8, ro0, rd0)

    # ---- 8 traces unrolled (no fori)
    @jax.jit
    def trace1x8(ro, rd):
        acc = jnp.zeros((N,))
        for i in range(DEPTH):
            t, tri, uu, vv = trace_mod.trace_bvh(geo, ro, rd,
                                                 jnp.full((N,), eps),
                                                 jnp.full((N,), 1e30))
            hit = trace_mod.hit_attributes(geo, ro, rd, t, tri, uu, vv)
            ro = jnp.where(hit.valid[:, None], hit.p + eps * hit.ns, ro)
            rd = jnp.where(hit.valid[:, None],
                           rd - 2.0 * jnp.sum(rd * hit.ns, -1,
                                              keepdims=True) * hit.ns, rd)
            acc = acc + t
        return acc
    bench("trace1x8", trace1x8, ro0, rd0)

    # ---- occlusion only
    @jax.jit
    def occl8(ro, rd):
        def body(i, acc):
            occ = trace_mod.occluded_bvh(geo, ro, rd,
                                         jnp.full((N,), eps),
                                         jnp.full((N,), 10.0))
            return acc + occ.astype(jnp.float32) + 1e-6 * i
        return jax.lax.fori_loop(0, DEPTH, body, jnp.zeros((N,)))
    bench("occl8", occl8, ro0, rd0)

    # ---- gathers vs one-hot
    table = jnp.asarray(np.random.default_rng(0).normal(
        size=(64, 32)).astype(np.float32))
    ids0 = jnp.asarray(np.random.default_rng(1).integers(
        0, 64, size=(N,)).astype(np.int32))

    @jax.jit
    def gather8(ids):
        def body(i, c):
            ids, acc = c
            for _ in range(12):
                row = table[ids]
                acc = acc + row[:, 0]
                ids = (ids + row[:, 1].astype(jnp.int32)) % 64
            return ids, acc
        _, acc = jax.lax.fori_loop(0, DEPTH, body, (ids, jnp.zeros((N,))))
        return acc
    bench("gather8", gather8, ids0)

    @jax.jit
    def onehot8(ids):
        def body(i, c):
            ids, acc = c
            for _ in range(12):
                oh = jax.nn.one_hot(ids, 64, dtype=jnp.float32)
                row = oh @ table
                acc = acc + row[:, 0]
                ids = (ids + row[:, 1].astype(jnp.int32)) % 64
            return ids, acc
        _, acc = jax.lax.fori_loop(0, DEPTH, body, (ids, jnp.zeros((N,))))
        return acc
    bench("onehot8", onehot8, ids0)

    # ---- NEE block
    @jax.jit
    def neeblock8(ro, rd, k):
        t, tri, uu, vv = trace_mod.trace(geo, ro, rd, jnp.full((N,), eps),
                                         jnp.full((N,), 1e30))
        hit = trace_mod.hit_attributes(geo, ro, rd, t, tri, uu, vv)
        sf = frame_mod.build_shading_frame(hit.ns, hit.dpdu)
        wi_l = sf.to_local(-rd)
        def body(i, acc):
            dkeys = rng.depth_key(keys, i)
            u_nee = rng.uniform(dkeys, rng.D_NEE, 3)
            nee = etab.sample_direct(et, geo, tables.spectra,
                                     jnp.zeros((N,), jnp.int32), hit.p, k,
                                     u_nee)
            wo_l = sf.to_local(nee["wo"])
            f, pdf_b = bsdf_dev.eval_f(tables, hit.mat_id, wi_l, wo_l,
                                       hit.uv, k)
            occ = trace_mod.occluded(geo, hit.p, nee["wo"],
                                     jnp.full((N,), eps),
                                     nee["dist"] - 2 * eps, hit.tri,
                                     nee["tri"])
            return acc + jnp.where(occ, 0.0, f[:, 0, 0] * nee["Li"])
        return jax.lax.fori_loop(0, DEPTH, body, jnp.zeros((N,)))
    bench("neeblock8", neeblock8, ro0, rd0, k)

    # ---- bsdf sample+compose
    @jax.jit
    def bsdf8(ro, rd, k):
        t, tri, uu, vv = trace_mod.trace(geo, ro, rd, jnp.full((N,), eps),
                                         jnp.full((N,), 1e30))
        hit = trace_mod.hit_attributes(geo, ro, rd, t, tri, uu, vv)
        sf = frame_mod.build_shading_frame(hit.ns, hit.dpdu)
        M0 = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (N, 4, 4))
        xf = _perp_axis(-rd)
        def body(i, c):
            M, acc = c
            dkeys = rng.depth_key(keys, i)
            u_b = jnp.concatenate([rng.uniform(dkeys, rng.D_BSDF_LOBE, 2),
                                   rng.uniform(dkeys, rng.D_BSDF_DIR, 2)],
                                  axis=-1)
            wi_l = sf.to_local(-rd)
            bs = bsdf_dev.sample(tables, hit.mat_id, wi_l, hit.uv, k, u_b)
            wo_w = sf.to_world(bs.wo)
            M2, _ = compose_scatter(M, xf, -rd, bs.Mw, -wo_w)
            return M2, acc + bs.pdf
        _, acc = jax.lax.fori_loop(0, DEPTH, body, (M0, jnp.zeros((N,))))
        return acc
    bench("bsdf8", bsdf8, ro0, rd0, k)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
