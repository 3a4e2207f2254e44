"""Special radii: ISCO, event horizon, ergosphere.

Reference: `src/special-radii.jl`. The generic ISCO solves dE/dr = 0 with a
derivative from AD; here the bracketing scan + bisection + Newton polish runs
as fixed-shape array ops (device-friendly, differentiable through the final
Newton fixed point).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from gradus_tpu.metrics.base import AbstractMetric
from gradus_tpu.orbits.circular import CircularOrbits

__all__ = ["isco", "event_horizon", "ergosphere", "is_naked_singularity"]


def _dE_dr(m: AbstractMetric, r):
    def E(r_):
        return CircularOrbits.energy(m, (r_, jnp.pi / 2))

    return jax.grad(E)(r)


def isco(
    m: AbstractMetric,
    lower_bound=None,
    upper_bound=None,
    n_scan: int = 512,
    max_upper_bound: float = 100.0,
    bisect_iters: int = 60,
    newton_iters: int = 3,
):
    """ISCO radius via dE/dr = 0 (reference special-radii.jl:14-40).

    Metrics with an analytic ISCO (Kerr) override `m.isco()`; this generic
    path scans (inner_radius, max_upper_bound] for the sign change of dE/dr,
    bisects, then Newton-polishes (so gradients w.r.t. metric parameters are
    the implicit-function derivatives).
    """
    # analytic fast path
    if type(m).isco is not AbstractMetric.isco:
        return m.isco()

    lo = jnp.asarray(
        lower_bound if lower_bound is not None else m.inner_radius() * 1.02
    )
    hi = jnp.asarray(upper_bound if upper_bound is not None else max_upper_bound)

    rs = jnp.linspace(lo, hi, n_scan)
    dE = jax.vmap(lambda r: _dE_dr(m, r))(rs)
    dE = jnp.where(jnp.isfinite(dE), dE, 1.0)
    # find the LAST sign change (outermost stable boundary): scan from outside
    neg_out = (jnp.signbit(dE[:-1]) != jnp.signbit(dE[1:]))
    idx = jnp.where(
        jnp.any(neg_out), rs.shape[0] - 2 - jnp.argmax(neg_out[::-1]), 0
    )
    a = rs[idx]
    b = rs[idx + 1]

    def bis(_, ab):
        a_, b_ = ab
        mid = 0.5 * (a_ + b_)
        same = jnp.signbit(_dE_dr(m, mid)) == jnp.signbit(_dE_dr(m, a_))
        return jnp.where(same, mid, a_), jnp.where(same, b_, mid)

    a, b = lax.fori_loop(0, bisect_iters, bis, (a, b))
    r0 = 0.5 * (a + b)

    def newton(_, r):
        f, df = jax.value_and_grad(lambda rr: _dE_dr(m, rr))(r)
        return r - f / jnp.where(jnp.abs(df) < 1e-30, 1.0, df)

    return lax.fori_loop(0, newton_iters, newton, r0)


def _horizon_condition(m: AbstractMetric, r, theta):
    """g^rr = 1/g_rr crosses zero at the horizon. Equivalent to the
    reference's g_tφ² − g_tt·g_φφ condition (special-radii.jl:60-100) —
    both ∝ Δ for Kerr — but stays regular at the poles where g_φφ → 0."""
    g = m.components(r, theta)
    return 1.0 / g[..., 1]


def _ergosphere_condition(m: AbstractMetric, r, theta):
    return m.components(r, theta)[..., 0]


def _root_over_theta(m, cond_fn, thetas, r_max, bisect_iters=60):
    """For each θ, the outermost root of cond(r, θ) in (0, r_max] by bisection."""

    def per_theta(theta):
        rs = jnp.linspace(1e-3, r_max, 512)
        c = cond_fn(m, rs, theta)
        sc = jnp.signbit(c[:-1]) != jnp.signbit(c[1:])
        found = jnp.any(sc)
        idx = jnp.where(found, rs.shape[0] - 2 - jnp.argmax(sc[::-1]), 0)
        a, b = rs[idx], rs[idx + 1]

        def bis(_, ab):
            a_, b_ = ab
            mid = 0.5 * (a_ + b_)
            same = jnp.signbit(cond_fn(m, mid, theta)) == jnp.signbit(
                cond_fn(m, a_, theta)
            )
            return jnp.where(same, mid, a_), jnp.where(same, b_, mid)

        a, b = lax.fori_loop(0, bisect_iters, bis, (a, b))
        return jnp.where(found, 0.5 * (a + b), jnp.nan)

    return jax.vmap(per_theta)(thetas)


def event_horizon(m: AbstractMetric, resolution: int = 100, r_max: float = 10.0):
    """(r(θ), θ) shape of the event horizon (reference `event_horizon`,
    special-radii.jl:102-131)."""
    thetas = jnp.linspace(0.0, jnp.pi, resolution)
    rs = _root_over_theta(m, _horizon_condition, thetas, r_max)
    return rs, thetas


def ergosphere(m: AbstractMetric, resolution: int = 100, r_max: float = 10.0):
    """(r(θ), θ) of the ergosphere surface g_tt = 0
    (reference special-radii.jl:133-147)."""
    thetas = jnp.linspace(0.0, jnp.pi, resolution)
    rs = _root_over_theta(m, _ergosphere_condition, thetas, r_max)
    return rs, thetas


def is_naked_singularity(m: AbstractMetric, resolution: int = 100) -> bool:
    """True if the horizon condition has no root for some θ
    (reference special-radii.jl:149-157)."""
    rs, _ = event_horizon(m, resolution)
    return bool(jnp.any(jnp.isnan(rs)))
