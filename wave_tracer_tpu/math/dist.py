"""1D distributions: host-built, device-sampled.

The reference exposes a `distribution1d_t` family (piecewise-linear, binned,
discrete, gaussian — reference include/wt/math/distribution/) used for
spectral importance sampling and reconstruction filters. Here a distribution
is a flax.struct of flat arrays built host-side (numpy) and sampled inside
jit via searchsorted + analytic segment inversion.

Conventions: the *unnormalized* density values are stored; `total` is the
integral; `pdf()` returns the normalized density.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class PiecewiseLinear1D:
    """Piecewise-linear density over nodes x (sorted). Mirrors the behaviour
    of reference include/wt/math/distribution/piecewise_linear_distribution.hpp."""
    x: jnp.ndarray        # (K,) node positions
    f: jnp.ndarray        # (K,) unnormalized density at nodes
    cdf: jnp.ndarray      # (K,) unnormalized cumulative integral, cdf[0]=0
    total: jnp.ndarray    # () integral of f dx

    def pdf(self, xq):
        """Normalized density at query points (0 outside support)."""
        val = jnp.interp(xq, self.x, self.f, left=0.0, right=0.0)
        return jnp.where(self.total > 0, val / jnp.maximum(self.total, 1e-30),
                         0.0)

    def sample(self, u):
        """Inverse-CDF sample; u in [0,1). Returns (x, pdf)."""
        target = u * self.total
        # segment i such that cdf[i] <= target < cdf[i+1]
        i = jnp.clip(jnp.searchsorted(self.cdf, target, side="right") - 1,
                     0, self.x.shape[0] - 2)
        x0, x1 = self.x[i], self.x[i + 1]
        f0, f1 = self.f[i], self.f[i + 1]
        c0 = self.cdf[i]
        dx = jnp.maximum(x1 - x0, 1e-30)
        r = target - c0                       # mass into this segment
        df = (f1 - f0) / dx
        # solve f0*t + 0.5*df*t^2 = r  for t in [0, dx]
        lin = r / jnp.maximum(f0, 1e-30)
        disc = jnp.maximum(f0 * f0 + 2.0 * df * r, 0.0)
        quad = (jnp.sqrt(disc) - f0) / jnp.where(jnp.abs(df) < 1e-20, 1.0, df)
        t = jnp.clip(jnp.where(jnp.abs(df) < 1e-20, lin, quad), 0.0, dx)
        xs = x0 + t
        fs = f0 + df * t
        return xs, fs / jnp.maximum(self.total, 1e-30)

    def integral(self, lo, hi):
        """Unnormalized integral of f over [lo, hi]."""
        def cum(v):
            v = jnp.clip(v, self.x[0], self.x[-1])
            i = jnp.clip(jnp.searchsorted(self.x, v, side="right") - 1,
                         0, self.x.shape[0] - 2)
            x0, x1 = self.x[i], self.x[i + 1]
            f0, f1 = self.f[i], self.f[i + 1]
            dx = jnp.maximum(x1 - x0, 1e-30)
            t = jnp.clip(v - x0, 0.0, dx)
            return self.cdf[i] + f0 * t + 0.5 * (f1 - f0) / dx * t * t
        return jnp.maximum(cum(hi) - cum(lo), 0.0)


def build_piecewise_linear(x: np.ndarray, f: np.ndarray) -> PiecewiseLinear1D:
    x = np.asarray(x, np.float64)
    f = np.maximum(np.asarray(f, np.float64), 0.0)
    assert x.ndim == 1 and x.shape == f.shape and len(x) >= 2
    seg = 0.5 * (f[1:] + f[:-1]) * np.diff(x)
    cdf = np.concatenate([[0.0], np.cumsum(seg)])
    return PiecewiseLinear1D(
        x=jnp.asarray(x, jnp.float32), f=jnp.asarray(f, jnp.float32),
        cdf=jnp.asarray(cdf, jnp.float32),
        total=jnp.asarray(cdf[-1], jnp.float32))


@struct.dataclass
class Discrete1D:
    """Discrete distribution over (position, weight) atoms (reference
    include/wt/math/distribution/discrete_distribution.hpp)."""
    pos: jnp.ndarray     # (K,)
    w: jnp.ndarray       # (K,) unnormalized weights
    cdf: jnp.ndarray     # (K,) inclusive prefix sum
    total: jnp.ndarray   # ()

    @property
    def count(self):
        return self.pos.shape[0]

    def sample(self, u):
        """Returns (index, position, pmf)."""
        target = u * self.total
        i = jnp.clip(jnp.searchsorted(self.cdf, target, side="right"),
                     0, self.count - 1)
        return i, self.pos[i], self.w[i] / jnp.maximum(self.total, 1e-30)

    def pmf(self, i):
        return self.w[i] / jnp.maximum(self.total, 1e-30)


def build_discrete(pos: np.ndarray, w: np.ndarray) -> Discrete1D:
    pos = np.asarray(pos, np.float64).reshape(-1)
    w = np.maximum(np.asarray(w, np.float64).reshape(-1), 0.0)
    cdf = np.cumsum(w)
    total = cdf[-1] if len(cdf) else 0.0
    return Discrete1D(pos=jnp.asarray(pos, jnp.float32),
                      w=jnp.asarray(w, jnp.float32),
                      cdf=jnp.asarray(cdf, jnp.float32),
                      total=jnp.asarray(total, jnp.float32))
