"""Complex Fresnel coefficients at an interface — batched jnp.

Behaviour parity with reference include/wt/interaction/fresnel.hpp:
``eta12`` is the refractive-index ratio η1/η2 (incident/transmitted medium);
the incident direction ``w`` points AWAY from the surface; ``n`` is the
surface normal on the incident side. Complex numbers are carried as jnp
complex64 arrays (XLA lowers them to interleaved f32 pairs on TPU).
"""

from __future__ import annotations

import jax.numpy as jnp

from wave_tracer_tpu.math import vec


def refract_dir(eta12, w, n):
    """Refracted direction; w away from surface. Returns (t, cost, eta, tir).
    (reference fresnel.hpp:36-54). eta12 real."""
    wn = vec.dot(w, n)
    eta = jnp.where(wn > 0, eta12, 1.0 / eta12)
    cost2 = 1.0 - eta ** 2 * (1.0 - wn ** 2)
    tir = cost2 < 0.0
    cost = jnp.sqrt(jnp.maximum(cost2, 0.0))
    nsgn = jnp.where(wn >= 0, 1.0, -1.0)[..., None] * n
    t = eta[..., None] * (wn[..., None] * n - w) - cost[..., None] * nsgn
    t = vec.normalize(t, eps=1e-24)
    t = jnp.where(tir[..., None], jnp.zeros_like(t).at[..., 2].set(1.0), t)
    return t, cost, eta, tir


def fresnel(eta12, w, n):
    """Full dielectric Fresnel (reference fresnel.hpp:75-119).

    eta12: complex (or real) ratio η1/η2, broadcastable to batch.
    Returns dict with t (refracted dir), eta (oriented ratio), Z (impedance
    factor), rs, rp, ts, tp (complex amplitudes), Ts, Tp (power
    transmittances; 0 on TIR).
    """
    eta12 = jnp.asarray(eta12, jnp.complex64)
    wn = vec.dot(w, n)
    abs_cosi = jnp.abs(wn)
    t, cost, _, tir = refract_dir(jnp.real(eta12), w, n)
    # oriented ratio: flip to 1/eta when entering from the back side
    eta = jnp.where(wn > 0, eta12, 1.0 / eta12)

    ci = abs_cosi.astype(jnp.complex64)
    ct = cost.astype(jnp.complex64)
    rs = (eta * ci - ct) / (eta * ci + ct)
    rp = (ci - eta * ct) / (ci + eta * ct)
    ts = rs + 1.0
    tp = (rp + 1.0) * eta

    Z = jnp.abs(ct / (eta * ci + 1e-30))
    Ts = jnp.minimum(1.0, Z * jnp.abs(ts) ** 2)
    Tp = jnp.minimum(1.0, Z * jnp.abs(tp) ** 2)

    # degenerate: grazing or TIR → full reflection
    bad = tir | (abs_cosi == 0.0)
    one = jnp.ones_like(rs)
    zero = jnp.zeros_like(rs)
    rs = jnp.where(bad, one, rs)
    rp = jnp.where(bad, one, rp)
    ts = jnp.where(bad, zero, ts)
    tp = jnp.where(bad, zero, tp)
    Ts = jnp.where(bad, jnp.zeros_like(Ts), Ts)
    Tp = jnp.where(bad, jnp.zeros_like(Tp), Tp)
    Z = jnp.where(bad, jnp.ones_like(Z), Z)
    return dict(t=t, eta=eta, Z=Z, rs=rs, rp=rp, ts=ts, tp=tp, Ts=Ts, Tp=Tp,
                tir=bad)


def fresnel_reflection_conductor(eta12, w, n):
    """Reflection-only Fresnel for conductors (complex η ratio)
    (reference fresnel.hpp:126-146). Returns (rs, rp)."""
    eta12 = jnp.asarray(eta12, jnp.complex64)
    wn = vec.dot(w, n)
    i = wn.astype(jnp.complex64)
    t = jnp.sqrt(1.0 - (1.0 - wn ** 2).astype(jnp.complex64) * eta12 ** 2)
    rs = (eta12 * i - t) / (eta12 * i + t)
    rp = (i - eta12 * t) / (i + eta12 * t)
    back = wn < 0
    rs = jnp.where(back, jnp.zeros_like(rs), rs)
    rp = jnp.where(back, jnp.zeros_like(rp), rp)
    return rs, rp
