"""Numerical orbit solving for metrics where the analytic circular-orbit
assumptions break.

Reference: `src/orbits/orbit-solving.jl:1-97` (golden-section over v^φ
minimising the radial stability measure of a traced orbit) and the NoZ
off-equatorial machinery (`src/metrics/noz-metric.jl:124-199`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from gradus_tpu.geodesics.equation import constrain_all, metric_jacobian
from gradus_tpu.integrate.tracing import trace_geodesics
from gradus_tpu.metrics.base import AbstractMetric
from gradus_tpu.orbits.circular import CircularOrbits

__all__ = [
    "solve_equatorial_circular_orbit",
    "solve_orbit_theta",
    "charged_circular_orbit_omega",
]

_GR = 0.6180339887498949


def _orbit_deviation(m, r, vphi, lam: float):
    """Endpoint radial deviation of a timelike orbit launched tangentially."""
    x = jnp.stack([jnp.zeros_like(r), r, jnp.full_like(r, jnp.pi / 2), jnp.zeros_like(r)], axis=-1)
    z = jnp.zeros_like(r)
    v = jnp.stack([z, z, z, vphi], axis=-1)
    gp = trace_geodesics(m, x, v, (0.0, lam), mu=1.0, chart_outer=10.0 * (jnp.max(jnp.atleast_1d(r)) + 100.0))
    return jnp.abs(gp.x[..., 1] - r) + jnp.abs(gp.x[..., 2] - jnp.pi / 2) * r


def solve_equatorial_circular_orbit(
    m: AbstractMetric,
    r,
    lam: float = 100.0,
    iters: int = 30,
    window: float = 0.1,
):
    """Golden-section over v^φ minimising the traced orbit's radial deviation
    (reference `solve_equatorial_circular_orbit`). Initial bracket around the
    analytic Ω-derived velocity."""
    r = jnp.atleast_1d(jnp.asarray(r, float))
    v_analytic = CircularOrbits.fourvelocity(
        m, (r, jnp.full_like(r, jnp.pi / 2))
    )[..., 3]
    a = v_analytic * (1.0 - window)
    b = v_analytic * (1.0 + window)
    c = b - _GR * (b - a)
    e = a + _GR * (b - a)
    fc = _orbit_deviation(m, r, c, lam)
    fe = _orbit_deviation(m, r, e, lam)
    for _ in range(iters):
        left = fc < fe
        a2 = jnp.where(left, a, c)
        b2 = jnp.where(left, e, b)
        c2 = jnp.where(left, b2 - _GR * (b2 - a2), e)
        e2 = jnp.where(left, c, a2 + _GR * (b2 - a2))
        probe = jnp.where(left, c2, e2)
        fp = _orbit_deviation(m, r, probe, lam)
        fc, fe = jnp.where(left, fp, fe), jnp.where(left, fc, fp)
        a, b, c, e = a2, b2, c2, e2
    return 0.5 * (a + b)


def solve_orbit_theta(m: AbstractMetric, r, bisect_iters: int = 60):
    """Off-equatorial circular orbit angle θ(r): root of
    ∂_θ g_tt + 2Ω ∂_θ g_tφ + Ω² ∂_θ g_φφ = 0 (reference `_solve_orbit_θ`,
    noz-metric.jl:124-137). Vectorized bisection over θ ∈ (0.3, π−0.3)."""
    r = jnp.asarray(r)

    def objective(theta):
        _, dgr, dgth = metric_jacobian(m, r, theta)
        om = CircularOrbits.omega_analytic(dgr)
        return dgth[..., 0] + 2.0 * dgth[..., 4] * om + dgth[..., 3] * om * om

    a = jnp.full_like(r, 0.3)
    b = jnp.full_like(r, jnp.pi - 0.3)

    def bis(_, ab):
        a_, b_ = ab
        mid = 0.5 * (a_ + b_)
        same = jnp.signbit(objective(mid)) == jnp.signbit(objective(a_))
        return jnp.where(same, mid, a_), jnp.where(same, b_, mid)

    a, b = lax.fori_loop(0, bisect_iters, bis, (a, b))
    return 0.5 * (a + b)


def charged_circular_orbit_omega(
    m,
    r,
    q: float = 0.0,
    mu: float = 1.0,
    contra_rotating: bool = False,
    newton_iters: int = 40,
):
    """Charged circular orbit angular velocity for Kerr-Newman: root of
    ½(ω²∂ᵣg_φφ + 2ω∂ᵣg_tφ + ∂ᵣg_tt) + (F^r_φ ω + F^r_t)·g_rr·(q/u^t) = 0
    (reference `CircularOrbits.Ω` override, kerr-newman-ad.jl:113-147)."""
    from gradus_tpu.metrics.kerr_newman import faraday_tensor

    r = jnp.asarray(r, float)
    theta = jnp.full_like(r, jnp.pi / 2)
    g, dgr, _ = metric_jacobian(m, r, theta)
    if q == 0.0:
        return CircularOrbits.omega_analytic(dgr, contra_rotating)

    x = jnp.stack([jnp.zeros_like(r), r, theta, jnp.zeros_like(r)], axis=-1)
    F = faraday_tensor(m, x)

    def f(om):
        delta = om * om * dgr[..., 3] + 2.0 * om * dgr[..., 4] + dgr[..., 0]
        arg = -(om * om * g[..., 3] + 2.0 * om * g[..., 4] + g[..., 0]) / mu**2
        inv_ut = jnp.sign(arg) * jnp.sqrt(jnp.abs(arg))
        return 0.5 * delta + (F[..., 1, 3] * om + F[..., 1, 0]) * g[..., 1] * q * inv_ut

    om0 = (-1.0 if contra_rotating else 1.0) * r / 100.0

    def newton(_, om):
        val, dval = jax.value_and_grad(f)(om)
        return om - val / jnp.where(jnp.abs(dval) < 1e-30, 1.0, dval)

    return lax.fori_loop(0, newton_iters, newton, om0)
