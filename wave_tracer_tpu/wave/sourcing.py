"""Beam sourcing geometry — the unified `sourcing_geometry_t`.

Reference include/wt/beam/beam_geometry.hpp:186-342: how sensors and
emitters decide a new beam's phase-space extents. Three modes:

* **from surface ellipse** — extents from a physical source area,
  enlarged to a minimum-uncertainty beam (MUB) at the wavenumber,
* **isotropic footprint** — point-like sources (point emitters, FSD
  restart vertices): a tiny spatial extent with the angular extent set
  by the directional spread, MUB-enlarged,
* **explicit** — possibly NON-physical extents, used by cameras
  (perspective.hpp:192-206 sources sub-diffraction beams on purpose).

This module centralizes the per-type rules that the integrators
previously inlined (plt_path_forward / plt_bdpt emitter prologues,
the FSD restart envelopes) so the heuristics live in ONE place.
"""

from __future__ import annotations

import jax.numpy as jnp

from wave_tracer_tpu.emitter import table as etab
from wave_tracer_tpu.wave import beam as beam_geo
from wave_tracer_tpu.wave import envelope as env_mod


def emitter_tan_alpha(et, e0):
    """Per-type angular extent of an emission beam (pre-MUB).

    * spot — the cone of its cutoff angle, scaled by the emitter's
      phase-space-extent scale (reference spot sourcing),
    * everything else — a small isotropic default (5% of the pse scale;
      point/area emitters' directional spread is already captured by
      the sampled direction distribution, the envelope only needs to
      stay narrow enough for the traversal's region queries).
    """
    pse = et.pse_scale[e0]
    cosc = et.cos_cutoff[e0]
    ta_spot = jnp.sqrt(jnp.maximum(1.0 - cosc * cosc, 1e-12)) \
        / jnp.maximum(cosc, 0.1) * pse
    return jnp.where(et.etype[e0] == etab.ET_SPOT, ta_spot, 0.05 * pse)


def source_emitter_mub(et, e0, k):
    """(spatial σ², tanα) of a minimum-uncertainty emission beam —
    `sourcing_geometry_t` applied to an emitter row (beam_geometry.hpp
    make_mub: enlarge to the physical uncertainty bound SBP ≥ 1/4)."""
    N = e0.shape[0]
    ta0 = emitter_tan_alpha(et, e0)
    return beam_geo.make_mub(jnp.zeros((N,)), ta0, k)


def emitter_envelope(et, e0, k, wo):
    """Full elliptic EnvState for freshly-sourced emission beams."""
    se_mub, ta_mub = source_emitter_mub(et, e0, k)
    from wave_tracer_tpu.integrator.path import _perp_axis
    return env_mod.EnvState(
        x=_perp_axis(wo), x0=jnp.sqrt(jnp.maximum(se_mub, 0.0)),
        ta=ta_mub, e=jnp.ones(e0.shape, jnp.float32))


def restart_envelope(rd_new, footprint, k, ta_cap: float = 0.3):
    """Isotropic-footprint sourcing for FSD/restart vertices: a near-
    point spatial extent whose angular extent is the minimum-uncertainty
    spread of the interaction footprint (beam_geometry.hpp
    minimum_uncertainty_tan_alpha), capped for traversal sanity."""
    from wave_tracer_tpu.integrator.path import _perp_axis
    N = rd_new.shape[0]
    ta = jnp.minimum(
        beam_geo.minimum_uncertainty_tan_alpha(
            jnp.maximum(footprint, 1e-9) ** 2, k), ta_cap)
    return env_mod.EnvState(x=_perp_axis(rd_new),
                            x0=jnp.full((N,), 1e-6), ta=ta,
                            e=jnp.ones((N,)))
