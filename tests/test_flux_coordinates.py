"""Reference unit-test parity: `test/unit/flux-calculations.jl` (Dauser+13
Lorentz factor + Wilkins & Fabian 2012 proper area closed forms) and
`test/unit/coordinates.jl` (oblate-spheroid transform pin)."""

import jax.numpy as jnp
import numpy as np

import gradus_tpu as gt
from gradus_tpu.corona.emissivity import lorentz_factor, proper_area
from gradus_tpu.redshift import keplerian_velocity_projector
from gradus_tpu.utils.linalg import oblate_spheroid_to_spherical


def _kerr_lorentz_dauser(a, r):
    """Dauser+13 closed-form Keplerian Lorentz factor (flux-calculations.jl:6-10)."""
    A = np.sqrt(r**2 - 2 * r + a**2) * (r ** (3 / 2) + a)
    B = (
        np.sqrt(r * np.sqrt(r) + 2 * a - 3 * np.sqrt(r))
        * np.sqrt(r**3 + a**2 * r + 2 * a**2)
        * r ** (1 / 4)
    )
    return A / B


def test_keplerian_lorentz_factor_matches_dauser():
    m = gt.KerrMetric(M=1.0, a=0.998)
    rr = np.geomspace(float(gt.isco(m)), 1000.0, 100)
    x = jnp.stack(
        [
            jnp.zeros(100),
            jnp.asarray(rr),
            jnp.full(100, jnp.pi / 2),
            jnp.zeros(100),
        ],
        axis=-1,
    )
    v_disc = keplerian_velocity_projector(m)(x)
    ours = np.asarray(lorentz_factor(m, x, v_disc))
    check = _kerr_lorentz_dauser(0.998, rr)
    np.testing.assert_allclose(ours, check, rtol=1e-8)


def test_proper_area_matches_wilkins_fabian():
    """2π√(g_rr·g_φφ) equals the Wilkins & Fabian 2012 closed form
    (flux-calculations.jl:30-52)."""
    a = 0.998
    m = gt.KerrMetric(M=1.0, a=a)
    rr = np.geomspace(float(gt.isco(m)), 1000.0, 100)
    x = jnp.stack(
        [
            jnp.zeros(100),
            jnp.asarray(rr),
            jnp.full(100, jnp.pi / 2),
            jnp.zeros(100),
        ],
        axis=-1,
    )
    ours = np.asarray(proper_area(m, x))
    A = rr**4 + a**2 * rr**2 + 2 * a**2 * rr
    B = rr**2 - 2 * rr + a**2
    check = 2 * np.pi * np.sqrt(A / B)
    np.testing.assert_allclose(ours, check, rtol=1e-8)


def test_oblate_spheroid_to_spherical_pin():
    """coordinates.jl: (x, h) = (1.02, 1.113) at a = 0.998 →
    r ≈ 1.3872, θ ≈ acos(0.8023)."""
    r, theta = oblate_spheroid_to_spherical(1.02, 1.113, 0.998)
    np.testing.assert_allclose(float(r), 1.3872, atol=1e-3)
    np.testing.assert_allclose(float(theta), np.arccos(0.8023), atol=1e-3)
