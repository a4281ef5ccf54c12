"""Fast BDPT sub-unit tests: blocked-flux integral (aperture power)."""

import numpy as np
import pytest
import jax.numpy as jnp

from tests.test_trace import make_geo
from wave_tracer_tpu.geometry import mesh
from wave_tracer_tpu.integrator.plt_bdpt import _blocked_flux


def _quad_geo(x0=-1.0, x1=1.0):
    """Rectangle spanning [x0,x1]×[-1,1] at z=1, normal −z (toward a beam
    travelling +z)."""
    soup = mesh.rectangle(2.0)  # [-1,1]² in xy at z=0
    pos = soup.positions
    pos[..., 0] = x0 + (pos[..., 0] * 0.5 + 0.5) * (x1 - x0)
    pos[..., 2] = 1.0
    geo, _ = make_geo(soup)
    return geo


class TestBlockedFlux:
    def _run(self, x0, x1, sigma=0.05):
        geo = _quad_geo(x0, x1)
        N = 1
        ro = jnp.zeros((N, 3))
        rd = jnp.asarray([[0.0, 0, 1]])
        fx = jnp.asarray([[1.0, 0, 0]])
        fy = jnp.asarray([[0.0, 1, 0]])
        z_int = jnp.asarray([1.0])
        dz = jnp.asarray([0.2])
        return float(_blocked_flux(geo, ro, rd, fx, fy, z_int, dz,
                                   jnp.asarray([0.0]),
                                   jnp.asarray([3.0 * sigma]),
                                   jnp.asarray([sigma]))[0])

    def test_full_cover(self):
        # wall covers the whole wavefront → blocked ≈ cap (0.95)
        assert self._run(-1.0, 1.0) == pytest.approx(0.95, abs=0.01)

    def test_half_cover(self):
        # wall covers x>0 → half the Gaussian mass
        assert self._run(0.0, 1.0) == pytest.approx(0.5, abs=0.02)

    def test_no_cover(self):
        # wall far off to the side → nothing blocked
        assert self._run(5.0, 6.0) == pytest.approx(0.0, abs=1e-3)
