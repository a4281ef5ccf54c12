"""Scene → device bake: one flat SceneData pytree consumed by integrators.

Collects every spectrum/texture/material reachable from the host scene,
assigns table rows, merges all shapes into a single BVH-ordered triangle
soup, and bakes the emitter + spectral-sampling tables. This is the
equivalent of the reference's scene bootstrap (reference
include/wt/scene/loader/bootstrap.hpp:84-208) with the ADS build and
element loads fused into one pass.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from flax import struct

from wave_tracer_tpu.accel import bvh as bvh_mod
from wave_tracer_tpu.accel import edges as edges_mod
from wave_tracer_tpu.accel import trace as trace_mod
from wave_tracer_tpu.bsdf import device as bsdf_dev
from wave_tracer_tpu.bsdf import model as bmodel
from wave_tracer_tpu.bsdf.table import bake_materials
from wave_tracer_tpu.emitter import model as emodel
from wave_tracer_tpu.emitter.table import EmitterTable, bake_emitters
from wave_tracer_tpu.geometry.mesh import TriangleSoup
from wave_tracer_tpu.scene.model import Scene
from wave_tracer_tpu.scene.spectral import (SpectralSampler,
                                            build_spectral_sampler)
from wave_tracer_tpu.spectrum.bake import bake_complex, bake_spectra
from wave_tracer_tpu.texture.texture import bake_textures


@struct.dataclass
class SceneData:
    """Everything the device integrator needs, as one pytree."""
    geo: trace_mod.GeoArrays
    tables: bsdf_dev.Tables
    emitters: EmitterTable
    spectral: SpectralSampler      # for the primary sensor
    edges: edges_mod.EdgeTable     # classified wedge edges (FSD)
    edge_clusters: edges_mod.EdgeClusters   # two-level edge index
    tri_clusters: trace_mod.TriClusters     # two-level triangle index


@dataclass
class BuiltScene:
    scene: Scene
    data: SceneData
    bvh: bvh_mod.FlatBVH
    spectral_per_sensor: list      # [SpectralSampler]


def _collect(scene: Scene):
    """Walk the scene and register spectra, complex spectra, textures and
    materials (composite children get their own rows)."""
    spectra, cspectra, textures, materials = [], [], [], []
    sp_ids, csp_ids, tex_ids = {}, {}, {}

    def add_spec(s):
        if s is not None and id(s) not in sp_ids:
            sp_ids[id(s)] = len(spectra)
            spectra.append(s)

    def add_cspec(s):
        if s is not None and id(s) not in csp_ids:
            csp_ids[id(s)] = len(cspectra)
            cspectra.append(s)

    def add_tex(t):
        if t is not None and id(t) not in tex_ids:
            tex_ids[id(t)] = len(textures)
            textures.append(t)
            add_spec(getattr(t, "spectrum", None))
            add_spec(getattr(t, "scale_spectrum", None))

    def add_mat(m):
        if m is None or any(m is x for x in materials):
            return
        materials.append(m)
        b = m.bsdf
        add_tex(m.opacity)
        add_tex(m.normalmap)
        if isinstance(b, bmodel.DiffuseBSDF):
            add_tex(b.reflectance)
        elif isinstance(b, (bmodel.DielectricBSDF, bmodel.SpmBSDF)):
            add_cspec(b.ior)
            add_cspec(b.ext_ior)
            add_spec(b.reflection_scale)
            add_spec(b.transmission_scale)
            if isinstance(b, bmodel.SpmBSDF):
                add_tex(b.profile.roughness)
        elif isinstance(b, bmodel.CompositeBSDF):
            for _, _, child in b.bins:
                add_mat(child)

    for shape in scene.shapes:
        add_mat(shape.material)
    for em in scene.emitters:
        add_spec(em.spectrum)
    for sensor in scene.sensors:
        r = sensor.response
        if r is not None:
            add_spec(r.spectrum)
            for cs in r.channel_spectra:
                add_spec(cs)

    return spectra, sp_ids, cspectra, csp_ids, textures, tex_ids, materials


def build_scene(scene: Scene) -> BuiltScene:
    (spectra, sp_ids, cspectra, csp_ids, textures, tex_ids,
     materials) = _collect(scene)

    mat_row = {id(m): i for i, m in enumerate(materials)}

    # merge all shapes; per-tri ids
    soups, mat_id, shape_id, emitter_id = [], [], [], []
    emitter_index = {id(e): i for i, e in enumerate(scene.emitters)}
    for si, shape in enumerate(scene.shapes):
        T = shape.soup.num_tris
        if T == 0:
            continue
        soups.append(shape.soup)
        mat_id.append(np.full(T, mat_row[id(shape.material)], np.int32))
        shape_id.append(np.full(T, si, np.int32))
        eid = emitter_index.get(id(shape.emitter), -1) \
            if shape.emitter is not None else -1
        emitter_id.append(np.full(T, eid, np.int32))
        if shape.emitter is not None:
            shape.emitter.shape_index = si

    if soups:
        soup = TriangleSoup.concatenate(soups)
        mat_id = np.concatenate(mat_id)
        shape_id = np.concatenate(shape_id)
        emitter_id = np.concatenate(emitter_id)
    else:
        soup = TriangleSoup(np.zeros((0, 3, 3), np.float32),
                            np.zeros((0, 3, 3), np.float32),
                            np.zeros((0, 3, 2), np.float32),
                            np.zeros((0, 3), np.float32),
                            np.zeros((0, 3), np.float32))
        mat_id = shape_id = emitter_id = np.zeros(0, np.int32)

    bvh = bvh_mod.build_bvh(soup.positions)
    geo = trace_mod.from_soup(soup, mat_id, shape_id, emitter_id, bvh)
    perm0 = bvh.tri_order if len(bvh.tri_order) else np.zeros(0, np.int64)
    edge_table = edges_mod.classify_edges(
        soup.positions[perm0] if len(perm0) else soup.positions,
        soup.geo_n[perm0] if len(perm0) else soup.geo_n)
    edge_clusters = edges_mod.build_edge_clusters(edge_table)
    # build with cap = the query-time candidate width (WT_TRI_CAP) so the
    # no-truncation invariant holds for every knob setting
    tri_clusters = trace_mod.build_tri_clusters(geo.p0, geo.e1, geo.e2,
                                                cap=trace_mod.TRI_CAP)

    spec_table = bake_spectra(spectra)
    cspec_table = bake_complex(cspectra)
    tex_table = bake_textures(textures, sp_ids)
    mat_table = bake_materials(materials, tex_ids, sp_ids, csp_ids)
    tables = bsdf_dev.Tables(materials=mat_table, textures=tex_table,
                             spectra=spec_table, cspectra=cspec_table)

    # emitter bake needs per-tri areas/emitter ids in device (BVH) order
    perm = bvh.tri_order if len(bvh.tri_order) else np.zeros(0, np.int64)
    areas_dev = soup.areas()[perm] if len(perm) else np.zeros(0)
    eid_dev = emitter_id[perm] if len(perm) else np.zeros(0, np.int32)
    etable = bake_emitters(scene.emitters, sp_ids, eid_dev, areas_dev,
                           scene_radius=scene.world_radius())

    per_sensor = []
    for sensor in scene.sensors:
        sens = sensor.response.sensitivity_spectrum()
        per_sensor.append(build_spectral_sampler(scene.emitters, sens))
    if not per_sensor:
        raise ValueError("scene has no sensors")

    data = SceneData(geo=geo, tables=tables, emitters=etable,
                     spectral=per_sensor[0], edges=edge_table,
                     edge_clusters=edge_clusters,
                     tri_clusters=tri_clusters)
    return BuiltScene(scene=scene, data=data, bvh=bvh,
                      spectral_per_sensor=per_sensor)
