import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradus_tpu.metrics import (
    KerrMetric,
    SchwarzschildMetric,
    JohannsenMetric,
    JohannsenPsaltisMetric,
    KerrNewmanMetric,
    MorrisThorneWormhole,
    DilatonAxion,
    BumblebeeMetric,
    NoZMetric,
    KerrRefractive,
    KerrDarkMatter,
    SphericalMetric,
)
from gradus_tpu.metrics.kerr import kerr_isco
from gradus_tpu.utils.linalg import sym4x4, sym4x4_inverse_components

ALL_METRICS = [
    KerrMetric(M=1.0, a=0.998),
    KerrMetric(M=1.0, a=0.0),
    JohannsenMetric(M=1.0, a=0.6, alpha13=0.2, alpha22=0.1, eps3=0.5),
    JohannsenPsaltisMetric(M=1.0, a=0.6, eps3=2.0),
    KerrNewmanMetric(M=1.0, a=0.5, Q=0.3),
    MorrisThorneWormhole(b=1.0),
    DilatonAxion(M=1.0, a=0.5, beta=0.2, b=1.0),
    BumblebeeMetric(M=1.0, a=0.2, l=0.1),
    NoZMetric(M=1.0, a=0.5, eps=0.3),
    KerrRefractive(M=1.0, a=0.5, n=1.2, corona_radius=20.0),
    KerrDarkMatter(M=1.0, a=0.5),
    SphericalMetric(),
]

SAMPLE_POINTS = [(4.2, 0.9), (6.0, np.pi / 2), (12.0, 1.2), (50.0, 2.0), (400.0, 0.4)]


@pytest.mark.parametrize("m", ALL_METRICS, ids=lambda m: type(m).__name__)
def test_components_finite_and_lorentzian(m):
    for r, th in SAMPLE_POINTS:
        if r < float(m.inner_radius()) * 1.05:
            continue
        g = m.components(jnp.asarray(r), jnp.asarray(th))
        assert g.shape == (5,)
        assert bool(jnp.all(jnp.isfinite(g)))
        # Lorentzian signature: g_tt < 0 (outside ergosphere this holds for
        # sample radii), spatial components > 0
        assert float(g[1]) > 0 and float(g[2]) > 0 and float(g[3]) > 0
        # determinant of the 4x4 must be negative
        det = float(jnp.linalg.det(sym4x4(g)))
        assert det < 0


@pytest.mark.parametrize("m", ALL_METRICS, ids=lambda m: type(m).__name__)
def test_closed_form_inverse(m):
    for r, th in SAMPLE_POINTS:
        g = m.components(jnp.asarray(r), jnp.asarray(th))
        ginv = sym4x4(sym4x4_inverse_components(g))
        ident = ginv @ sym4x4(g)
        np.testing.assert_allclose(np.asarray(ident), np.eye(4), atol=1e-11)


def test_kerr_reduces_to_schwarzschild():
    k = KerrMetric(M=1.0, a=0.0)
    s = SchwarzschildMetric(M=1.0)
    r, th = jnp.asarray(5.0), jnp.asarray(1.0)
    np.testing.assert_allclose(
        np.asarray(k.components(r, th)), np.asarray(s.components(r, th)), rtol=1e-14
    )
    # analytic Schwarzschild values
    g = k.components(r, th)
    assert np.isclose(float(g[0]), -(1 - 2 / 5.0))
    assert np.isclose(float(g[1]), 1 / (1 - 2 / 5.0))
    assert np.isclose(float(g[2]), 25.0)
    assert np.isclose(float(g[3]), 25.0 * np.sin(1.0) ** 2)


def test_kerr_isco_values():
    assert np.isclose(float(kerr_isco(1.0, 0.0)), 6.0, atol=1e-12)
    # BPT 1972 prograde ISCO for a = 0.998 is ~1.237 M
    assert np.isclose(float(kerr_isco(1.0, 0.998)), 1.23688, atol=1e-3)
    # retrograde a = -0.998 → ~8.99 M
    assert np.isclose(float(kerr_isco(1.0, -0.998)), 8.99, atol=0.02)


def test_inner_radius():
    m = KerrMetric(M=1.0, a=0.998)
    rh = float(m.inner_radius())
    assert np.isclose(rh, 1.0 + np.sqrt(1 - 0.998**2))
    kn = KerrNewmanMetric(M=1.0, a=0.5, Q=0.3)
    assert np.isclose(float(kn.inner_radius()), 1.0 + np.sqrt(1 - 0.25 - 0.09))


def test_metric_is_pytree_and_differentiable():
    def f(a):
        m = KerrMetric(M=1.0, a=a)
        return m.components(jnp.asarray(4.0), jnp.asarray(1.2))[4]

    grad = jax.grad(f)(0.5)
    assert np.isfinite(float(grad))
    # finite difference check
    eps = 1e-6
    fd = (f(0.5 + eps) - f(0.5 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(grad), float(fd), rtol=1e-6)


def test_kerr_newman_potential():
    kn = KerrNewmanMetric(M=1.0, a=0.5, Q=0.3)
    A = kn.electromagnetic_potential(jnp.asarray(4.0), jnp.asarray(1.0))
    sigma = 16.0 + (0.5 * np.cos(1.0)) ** 2
    assert np.isclose(float(A[0]), 4.0 * 0.3 / sigma)
    assert np.isclose(float(A[3]), -4.0 * 0.3 / sigma * 0.5 * np.sin(1.0) ** 2)


@pytest.mark.parametrize("m", ALL_METRICS, ids=lambda m: type(m).__name__)
def test_components5_jac_matches_ad(m):
    """Hand-derived metric Jacobians (Kerr override) must match the generic
    two-jvp AD fallback to near machine precision; for metrics without an
    override this pins the fallback itself."""
    from gradus_tpu.metrics.base import _ad_components5_jac

    rng = np.random.default_rng(7)
    r = jnp.asarray(rng.uniform(2.5, 900.0, 32))
    th = jnp.asarray(rng.uniform(0.05, np.pi - 0.05, 32))
    analytic = m.components5_jac(r, th)
    ad = _ad_components5_jac(m, r, th)
    for tup_a, tup_b in zip(analytic, ad):
        for a_, b_ in zip(tup_a, tup_b):
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), rtol=5e-12, atol=1e-12
            )
