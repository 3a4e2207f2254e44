"""Exotic spacetimes: Morris-Thorne wormhole, Kerr + refractive medium,
Kerr + dark-matter shell.

Physics parity with reference `src/metrics/{morris-thorne-ad, kerr-refractive-ad,
kerr-dark-matter}.jl`.
"""

from __future__ import annotations

import jax.numpy as jnp

from gradus_tpu.metrics.base import AbstractMetric, metric_dataclass
from gradus_tpu.metrics.kerr import kerr_isco
from gradus_tpu.utils.linalg import smooth_step_interpolate

__all__ = ["MorrisThorneWormhole", "KerrRefractive", "KerrDarkMatter"]


@metric_dataclass
class MorrisThorneWormhole(AbstractMetric):
    """Morris-Thorne wormhole with throat size ``b``; radial coordinate is the
    proper length ``l`` (reference `src/metrics/morris-thorne-ad.jl:26-37`)."""

    b: float = 1.0

    def components(self, r, theta):
        l = r
        one = jnp.ones_like(l)
        tt = -one
        rr = one
        hh = self.b**2 + l * l
        # NOTE: the reference writes (b² + l²)·sin(θ) — reproduced verbatim for
        # parity (morris-thorne-ad.jl:10), though sin²θ is the textbook form.
        pp = (self.b**2 + l * l) * jnp.sin(theta)
        tp = jnp.zeros_like(l)
        return jnp.stack([tt, rr, hh, pp, tp], axis=-1)

    def inner_radius(self):
        return jnp.zeros_like(jnp.asarray(self.b))


@metric_dataclass
class KerrRefractive(AbstractMetric):
    """Kerr with a refractive-index ansatz ``n`` inside ``corona_radius``;
    the index boundary is smoothed so it has a gradient
    (reference `src/metrics/kerr-refractive-ad.jl:44-64`)."""

    M: float = 1.0
    a: float = 0.0
    n: float = 1.0
    corona_radius: float = 20.0

    def components(self, r, theta):
        M, a = self.M, self.a
        R = 2.0 * M
        sin2 = jnp.sin(theta) ** 2
        sigma = r * r + a * a * jnp.cos(theta) ** 2
        delta = r * r - R * r + a * a

        tt = -(1.0 - (R * r) / sigma)
        rr = sigma / delta
        hh = sigma
        pp = sin2 * (r * r + a * a + (sin2 * R * r * a * a) / sigma)
        tp = (-R * r * a * sin2) / sigma

        t = smooth_step_interpolate(r, self.corona_radius)
        n = t + (1.0 - t) * self.n
        return jnp.stack([tt / (n * n), rr, hh, pp, tp / n], axis=-1)

    def inner_radius(self):
        return self.M + jnp.sqrt(self.M**2 - self.a**2)

    def isco(self):
        return kerr_isco(self.M, self.a)


@metric_dataclass
class KerrDarkMatter(AbstractMetric):
    """Kerr plus a smoothed dark-matter mass shell between ``r_s`` and
    ``r_s + delta_r`` (reference `src/metrics/kerr-dark-matter.jl:1-72`,
    arXiv:2003.06829)."""

    M: float = 1.0
    a: float = 0.0
    M_dark_matter: float = 2.0
    delta_r: float = 20.0
    r_s: float = 10.0

    def dark_matter_mass(self, r):
        dr = (r - self.r_s) / self.delta_r
        G = (3.0 - 2.0 * dr) * dr * dr
        return jnp.where(
            r < self.r_s,
            0.0,
            jnp.where(r < self.r_s + self.delta_r, self.M_dark_matter * G, self.M_dark_matter),
        )

    def components(self, r, theta):
        M = self.M + self.dark_matter_mass(r)
        a = self.a
        R = 2.0 * M
        sin2 = jnp.sin(theta) ** 2
        cos2 = 1.0 - sin2
        sigma = r * r + a * a * cos2
        delta = r * r + a * a - R * r

        tt = -(1.0 - (R * r) / sigma)
        rr = sigma / delta
        hh = sigma
        pp = sin2 * (r * r + a * a + (sin2 * R * r * a * a) / sigma)
        tp = (-R * r * a * sin2) / sigma
        return jnp.stack([tt, rr, hh, pp, tp], axis=-1)

    def inner_radius(self):
        return self.M + jnp.sqrt(self.M**2 - self.a**2)
