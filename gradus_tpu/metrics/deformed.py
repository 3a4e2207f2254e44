"""Deformed/parametrized non-Kerr metrics: Johannsen, Johannsen-Psaltis, NoZ,
bumblebee, and dilaton-axion.

Physics parity with reference files `src/metrics/{johannsen-ad,
johannsen-psaltis-ad, noz-metric, bumblebee-ad, dilaton-axion-ad}.jl`.
"""

from __future__ import annotations

import jax.numpy as jnp

from gradus_tpu.metrics.base import AbstractMetric, metric_dataclass

__all__ = [
    "JohannsenMetric",
    "JohannsenPsaltisMetric",
    "NoZMetric",
    "BumblebeeMetric",
    "DilatonAxion",
]


@metric_dataclass
class JohannsenMetric(AbstractMetric):
    """Johannsen (2013) deformation metric: spin ``a`` + deviation parameters
    ``α13, α22, α52, ϵ3`` (reference `src/metrics/johannsen-ad.jl:49-67`)."""

    M: float = 1.0
    a: float = 0.0
    alpha13: float = 0.0
    alpha22: float = 0.0
    alpha52: float = 0.0
    eps3: float = 0.0

    def components(self, r, theta):
        M, a = self.M, self.a
        A1 = 1.0 + self.alpha13 * (M / r) ** 3
        A2 = 1.0 + self.alpha22 * (M / r) ** 2
        A5 = 1.0 + self.alpha52 * (M / r) ** 2
        f = self.eps3 * M**3 / r
        sin2 = jnp.sin(theta) ** 2
        sigma = r * r + a * a * (1.0 - sin2) + f
        delta = r * r - 2.0 * M * r + a * a
        r2a2 = r * r + a * a

        denom = (r2a2 * A1 - a * a * A2 * sin2) ** 2
        tt = -sigma * (delta - a * a * A2 * A2 * sin2)
        rr = sigma / (delta * A5)
        hh = sigma
        pp = sigma * sin2 * (r2a2**2 * A1**2 - a * a * delta * sin2)
        tp = -a * sigma * sin2 * (r2a2 * A1 * A2 - delta)
        return jnp.stack([tt / denom, rr, hh, pp / denom, tp / denom], axis=-1)

    def inner_radius(self):
        return self.M + jnp.sqrt(self.M**2 - self.a**2)


@metric_dataclass
class JohannsenPsaltisMetric(AbstractMetric):
    """Johannsen & Psaltis (2011) deformed Kerr with deviation ``ϵ3``
    (reference `src/metrics/johannsen-psaltis-ad.jl`)."""

    M: float = 1.0
    a: float = 0.0
    eps3: float = 0.0

    def components(self, r, theta):
        M, a = self.M, self.a
        sin2 = jnp.sin(theta) ** 2
        sigma = r * r + a * a * (1.0 - sin2)
        h = self.eps3 * M**3 * r / sigma**2
        delta = r * r - 2.0 * M * r + a * a

        tt = -(1.0 + h) * (1.0 - 2.0 * M * r / sigma)
        rr = sigma * (1.0 + h) / (delta + a * a * sin2 * h)
        hh = sigma
        term1 = sin2 * (r * r + a * a + 2.0 * a * a * M * r * sin2 / sigma)
        term2 = h * a * a * (sigma + 2.0 * M * r) * sin2**2 / sigma
        pp = term1 + term2
        tp = -2.0 * a * M * r * sin2 * (1.0 + h) / sigma
        return jnp.stack([tt, rr, hh, pp, tp], axis=-1)

    def inner_radius(self):
        return self.M + jnp.sqrt(self.M**2 - self.a**2)


@metric_dataclass
class NoZMetric(AbstractMetric):
    """"No-Z" parametrized non-Kerr metric with deviation ``ϵ``
    (reference `src/metrics/noz-metric.jl:55-120`; note the dy² = sin²θ dθ²
    coordinate factor folded into g_θθ)."""

    M: float = 1.0
    a: float = 0.0
    eps: float = 0.0

    def components(self, r, theta):
        M, a = self.M, self.a
        sin2 = jnp.sin(theta) ** 2
        y = jnp.cos(theta)
        e = self.eps * M * a * y

        sig = r * r + a * a * y * y
        den = sig * sig + (r * r - 2.0 * M * r + a * a * y * y) * e

        tt = -1.0 + (2.0 * M * r * sig) / den
        pp = (
            (1.0 - y * y)
            * (sig + e)
            * (
                r**4
                + a**4 * y * y
                + r * r * (a * a + a * a * y * y + e)
                + a * a * e
                + 2.0 * M * r * (a * a - a * a * y * y - e)
            )
        ) / den
        rr = (sig + e) / (r * r - 2.0 * M * r + a * a)
        yy = (sig + e) / (1.0 - y * y)
        tp = -(2.0 * M * r * a * (1.0 - y * y) * (sig + e)) / den
        return jnp.stack([tt, rr, yy * sin2, pp, tp], axis=-1)

    def inner_radius(self):
        return self.M + jnp.sqrt(self.M**2 - self.a**2)


@metric_dataclass
class BumblebeeMetric(AbstractMetric):
    """Lorentz-violating bumblebee-gravity black hole, slow-rotation
    approximation (|a| < 0.3), LSB parameter ``l``
    (reference `src/metrics/bumblebee-ad.jl:25-52`)."""

    M: float = 1.0
    a: float = 0.0
    l: float = 0.0

    def components(self, r, theta):
        M, a, l = self.M, self.a, self.l
        sin2 = jnp.sin(theta) ** 2
        delta = (r * r - 2.0 * M * r) / (l + 1.0)
        tt = -(1.0 - 2.0 * M / r)
        rr = r * r / delta
        hh = r * r
        pp = r * r * sin2
        tp = -2.0 * M * a * sin2 / r
        return jnp.stack([tt, rr, hh, pp, tp], axis=-1)

    def inner_radius(self):
        return self.M + jnp.sqrt(self.M**2 - self.a**2)


@metric_dataclass
class DilatonAxion(AbstractMetric):
    """Einstein-Maxwell-dilaton-axion black hole, García et al. (1995)
    (reference `src/metrics/dilaton-axion-ad.jl:57-76`)."""

    M: float = 1.0
    a: float = 0.5
    beta: float = 0.0
    b: float = 1.0

    def components(self, r, theta):
        M, a, beta, b = self.M, self.a, self.beta, self.b
        R = M
        is_zero = beta == 0.0  # python-level when params are concrete floats
        # guarded divisions (β = 0 ⇒ all β-ratios 0, matching the reference)
        bb = jnp.where(beta == 0.0, 0.0, beta / jnp.where(b == 0.0, 1.0, b))
        ba = jnp.where(beta == 0.0, 0.0, beta / jnp.where(a == 0.0, 1.0, a))
        bab = jnp.where(
            beta == 0.0, 0.0, beta / jnp.where(a * b == 0.0, 1.0, a * b)
        )
        del is_zero

        sin2 = jnp.sin(theta) ** 2
        csc2 = 1.0 / sin2
        sigma = r * r + a * a * jnp.cos(theta) ** 2
        delta = r * r + a * a - 2.0 * R * r
        delta_hat = delta - (beta * beta + 2.0 * b * r) - R * (R + 2.0 * b) * bb * bb
        sigma_hat = (
            sigma
            - (beta * beta + 2.0 * b * r)
            + R * R * bb * (bb - 2.0 * a * jnp.cos(theta))
        )
        dlt = r * r - 2.0 * b * r + a * a
        W = 1.0 + (bab * (2.0 * jnp.cos(theta) - bab) + ba * ba) * csc2
        A = dlt * dlt - delta_hat * (W * a * jnp.sin(theta)) ** 2

        tt = -(delta_hat - a * a * sin2) / sigma_hat
        rr = sigma_hat / delta_hat
        hh = sigma_hat
        pp = A * sin2 / sigma_hat
        tp = -a * (dlt - delta_hat * W) * sin2 / sigma_hat
        return jnp.stack([tt, rr, hh, pp, tp], axis=-1)

    def inner_radius(self):
        bb = jnp.where(self.beta == 0.0, 0.0, self.beta / jnp.where(self.b == 0.0, 1.0, self.b))
        return (
            self.M
            + self.b
            + jnp.sqrt(
                (self.M + self.b) ** 2
                - self.a**2
                + self.beta**2
                - (self.M - 2 * self.b) * self.M * bb**2
            )
        )
