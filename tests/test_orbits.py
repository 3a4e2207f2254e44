"""Circular orbits, ISCO, special radii, plunging velocities."""

import jax.numpy as jnp
import numpy as np
import pytest

from gradus_tpu.geodesics import propernorm, geodesic_equation
from gradus_tpu.metrics import KerrMetric, SchwarzschildMetric, JohannsenPsaltisMetric
from gradus_tpu.orbits import (
    CircularOrbits,
    isco,
    event_horizon,
    ergosphere,
    interpolate_plunging_velocities,
)


def test_schwarzschild_circular_orbit_analytic():
    """Ω = √(M/r³), E = (1-2M/r)/√(1-3M/r), L = √(Mr)/√(1-3M/r)."""
    m = SchwarzschildMetric(M=1.0)
    for r in (6.0, 10.0, 20.0):
        Om = float(CircularOrbits.Omega(m, (r, np.pi / 2)))
        assert np.isclose(Om, np.sqrt(1 / r**3), rtol=1e-12)
        E = float(CircularOrbits.energy(m, (r, np.pi / 2)))
        L = float(CircularOrbits.angmom(m, (r, np.pi / 2)))
        assert np.isclose(E, (1 - 2 / r) / np.sqrt(1 - 3 / r), rtol=1e-12)
        assert np.isclose(L, np.sqrt(r) / np.sqrt(1 - 3 / r), rtol=1e-12)


def test_circular_fourvelocity_is_normalized_and_geodesic():
    m = KerrMetric(M=1.0, a=0.9)
    for r in (4.0, 8.0, 15.0):
        x = jnp.array([0.0, r, np.pi / 2, 0.0])
        v = CircularOrbits.fourvelocity(m, (r, np.pi / 2))
        # timelike normalization
        assert np.isclose(float(propernorm(m.metric(x), v)), -1.0, atol=1e-12)
        # circular orbit satisfies the geodesic equation with zero radial accel
        acc = geodesic_equation(m, x, v)
        np.testing.assert_allclose(np.asarray(acc), np.zeros(4), atol=1e-11)


def test_kerr_analytic_isco_vs_generic():
    """The generic dE/dr = 0 root-finder must agree with Bardeen's analytic
    ISCO (generic path forced via a JP metric with eps3=0 ≡ Kerr)."""
    a = 0.7
    analytic = float(isco(KerrMetric(M=1.0, a=a)))
    generic = float(isco(JohannsenPsaltisMetric(M=1.0, a=a, eps3=0.0)))
    assert np.isclose(generic, analytic, rtol=1e-8)


def test_event_horizon_and_ergosphere_kerr():
    a = 0.9
    m = KerrMetric(M=1.0, a=a)
    rs, thetas = event_horizon(m, resolution=32)
    r_expected = 1 + np.sqrt(1 - a * a)
    np.testing.assert_allclose(np.asarray(rs), r_expected, rtol=1e-8)
    re, thetas = ergosphere(m, resolution=33)
    expected = 1 + np.sqrt(1 - (a * np.cos(np.asarray(thetas))) ** 2)
    np.testing.assert_allclose(np.asarray(re), expected, rtol=1e-8)


def test_plunging_velocity_properties():
    """Inside the ISCO: timelike normalized, E and L match the ISCO values,
    v^r < 0."""
    m = KerrMetric(M=1.0, a=0.5)
    plunge = interpolate_plunging_velocities(m)
    r_isco = float(plunge.r_isco)
    for r in (r_isco * 0.95, r_isco * 0.7, r_isco * 0.5):
        v = plunge(jnp.asarray(r))
        x = jnp.array([0.0, r, np.pi / 2, 0.0])
        g = m.metric(x)
        assert np.isclose(float(propernorm(g, v)), -1.0, atol=1e-10)
        assert float(v[1]) < 0
        E = -float(g[0, 0] * v[0] + g[0, 3] * v[3])
        L = float(g[3, 3] * v[3] + g[0, 3] * v[0])
        np.testing.assert_allclose(E, float(plunge.E), rtol=1e-10)
        np.testing.assert_allclose(L, float(plunge.L), rtol=1e-10)


def test_plunging_matches_circular_at_isco():
    m = KerrMetric(M=1.0, a=0.5)
    plunge = interpolate_plunging_velocities(m)
    r_isco = plunge.r_isco
    v_p = plunge(r_isco)
    v_c = CircularOrbits.fourvelocity(m, (r_isco, jnp.pi / 2))
    np.testing.assert_allclose(
        np.asarray(v_p), np.asarray(v_c), atol=1e-4
    )  # v^r → 0 at the ISCO
