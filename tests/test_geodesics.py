"""Geodesic-equation correctness: analytic Christoffel checks and norm constraints."""

import jax
import jax.numpy as jnp
import numpy as np

from gradus_tpu.geodesics import (
    geodesic_equation,
    metric_jacobian,
    constrain,
    constrain_all,
    propernorm,
)
from gradus_tpu.metrics import KerrMetric, SchwarzschildMetric, SphericalMetric


def test_metric_jacobian_schwarzschild():
    m = SchwarzschildMetric(M=1.0)
    g, dgr, dgth = metric_jacobian(m, 5.0, 1.0)
    # g_tt = -(1 - 2/r): d/dr = -2/r²
    assert np.isclose(float(dgr[0]), -2 / 25.0, rtol=1e-12)
    # g_rr = (1-2/r)^-1: d/dr = -(1-2/r)^-2 * 2/r²
    assert np.isclose(float(dgr[1]), -((1 - 0.4) ** -2) * 2 / 25.0, rtol=1e-12)
    # g_θθ = r² → 2r
    assert np.isclose(float(dgr[2]), 10.0, rtol=1e-12)
    # g_φφ = r² sin²θ: ∂θ = r² · 2 sinθ cosθ
    assert np.isclose(float(dgth[3]), 25.0 * 2 * np.sin(1.0) * np.cos(1.0), rtol=1e-12)


def test_schwarzschild_radial_acceleration():
    """For a momentarily static particle (v = (v^t,0,0,0)),
    a^r = -Γ^r_tt (v^t)² = -(M/r²)(1-2M/r)(v^t)²."""
    m = SchwarzschildMetric(M=1.0)
    x = jnp.array([0.0, 10.0, np.pi / 2, 0.0])
    v = jnp.array([0.0, 0.0, 0.0, 0.0])
    v = constrain_all(m, x, v, mu=1.0)
    acc = geodesic_equation(m, x, v)
    r = 10.0
    f = 1 - 2 / r
    expected_ar = -(1 / r**2) * f * float(v[0]) ** 2
    assert np.isclose(float(acc[1]), expected_ar, rtol=1e-12)
    assert np.isclose(float(acc[0]), 0.0, atol=1e-14)
    assert np.isclose(float(acc[2]), 0.0, atol=1e-14)
    assert np.isclose(float(acc[3]), 0.0, atol=1e-14)


def test_photon_circular_orbit_kerr_zero():
    """At r = 3M (photon sphere), a circular null orbit has zero radial
    acceleration."""
    m = SchwarzschildMetric(M=1.0)
    r = 3.0
    x = jnp.array([0.0, r, np.pi / 2, 0.0])
    # null circular: Ω = 1/(±b) with b = 3√3 M; v^φ/v^t = Ω = 1/sqrt(27)
    vphi = 1.0
    v = jnp.array([0.0, 0.0, 0.0, vphi])
    v = constrain_all(m, x, v, mu=0.0)
    # check null norm
    norm = float(propernorm(m.metric(x), v))
    assert abs(norm) < 1e-12
    acc = geodesic_equation(m, x, v)
    assert abs(float(acc[1])) < 1e-12  # no radial acceleration on photon sphere


def test_constrain_null_and_timelike():
    m = KerrMetric(M=1.0, a=0.9)
    x = jnp.array([0.0, 7.0, 1.1, 0.3])
    v3 = jnp.array([0.0, -0.3, 0.1, 0.02])
    for mu in (0.0, 1.0):
        v = constrain_all(m, x, v3, mu=mu)
        norm = float(propernorm(m.metric(x), v))
        assert np.isclose(norm, -mu * mu, atol=1e-12)


def test_flat_space_geodesic_is_straight():
    """In spherical Minkowski, a radial ray has zero coordinate acceleration
    in r; angular terms vanish for purely radial motion."""
    m = SphericalMetric()
    x = jnp.array([0.0, 10.0, 1.0, 0.0])
    v = jnp.array([1.0, -1.0, 0.0, 0.0])
    acc = geodesic_equation(m, x, v)
    np.testing.assert_allclose(np.asarray(acc), np.zeros(4), atol=1e-14)


def test_geodesic_equation_differentiable_wrt_spin():
    def f(a):
        m = KerrMetric(M=1.0, a=a)
        x = jnp.array([0.0, 5.0, 1.2, 0.0])
        v = jnp.array([0.0, -0.5, 0.0, 0.1])
        v = constrain_all(m, x, v, mu=0.0)
        return geodesic_equation(m, x, v)[1]

    g = jax.grad(f)(0.5)
    eps = 1e-6
    fd = (f(0.5 + eps) - f(0.5 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)


def test_batched_geodesic_equation():
    m = KerrMetric(M=1.0, a=0.7)
    xs = jnp.stack(
        [jnp.array([0.0, 5.0 + i, 1.0 + 0.1 * i, 0.0]) for i in range(4)]
    )
    vs = jnp.stack(
        [jnp.array([1.0, -0.5, 0.01 * i, 0.1]) for i in range(4)]
    )
    batched = jax.vmap(lambda x, v: geodesic_equation(m, x, v))(xs, vs)
    for i in range(4):
        single = geodesic_equation(m, xs[i], vs[i])
        np.testing.assert_allclose(np.asarray(batched[i]), np.asarray(single), rtol=1e-13)
