"""Radiative-transfer trace (9+1 state) and winding counting."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import gradus_tpu as gt
from gradus_tpu.camera.impact import map_impact_parameters
from gradus_tpu.integrate import StatusCodes
from gradus_tpu.integrate.tracing import trace_radiative_transfer, trace_windings
from gradus_tpu.geometry.discs import ThickDisc, _geometry_dataclass
from gradus_tpu.utils.linalg import equatorial_project, spinaxis_project


def test_windings_flat_vs_orbiting():
    m = gt.SchwarzschildMetric(M=1.0)
    x = jnp.array([0.0, 1000.0, np.pi / 2 - 0.3, 0.0])
    # wide ray: passes the plane once; near-critical: orbits several times
    v_wide = map_impact_parameters(m, x, jnp.asarray(30.0), jnp.asarray(0.0))
    v_crit = map_impact_parameters(m, x, jnp.asarray(5.2), jnp.asarray(0.0))
    _, w_wide = trace_windings(m, x, v_wide, (0.0, 3000.0))
    _, w_crit = trace_windings(m, x, v_crit, (0.0, 3000.0))
    assert int(w_wide) == 1
    assert int(w_crit) >= 2


@_geometry_dataclass
class _EmittingTorus(ThickDisc.__mro__[1]):  # AbstractThickAccretionDisc
    """Top-hat emitting slab |z| < 1 between ρ ∈ [8, 12], j_ν = const."""

    inner_r: float = 8.0
    outer_r: float = 12.0

    def cross_section(self, rho):
        return jnp.where((rho > self.inner_r) & (rho < self.outer_r), 1.0, -1.0)

    def emission_coefficient(self, x4, nu):
        return jnp.ones(x4.shape[:-1], dtype=x4.dtype)


def test_radiative_transfer_through_slab():
    m = gt.SchwarzschildMetric(M=1.0)
    slab = _EmittingTorus()
    x = jnp.array([0.0, 500.0, np.deg2rad(75.0), 0.0])
    # ray crossing the equatorial slab region near ρ ~ 10
    v_thru = map_impact_parameters(m, x, jnp.asarray(10.0), jnp.asarray(0.0))
    # ray far outside the slab
    v_miss = map_impact_parameters(m, x, jnp.asarray(100.0), jnp.asarray(0.0))
    gp_thru = trace_radiative_transfer(m, x, v_thru, (0.0, 1200.0), geometry=slab)
    gp_miss = trace_radiative_transfer(m, x, v_miss, (0.0, 1200.0), geometry=slab)
    I_thru = float(gp_thru.aux[0])
    I_miss = float(gp_miss.aux[0])
    crossings_thru = int(gp_thru.aux[1])
    # the through-ray must have entered and exited the volume and gained I
    assert crossings_thru >= 2
    assert I_thru > 1.0  # I0 = 1 plus accumulated emission
    np.testing.assert_allclose(I_miss, 1.0, atol=1e-8)
