"""Kerr-Newman charged black hole, with electromagnetic potential and Faraday
tensor for charged-particle tracing.

Physics parity: reference `src/metrics/kerr-newman-ad.jl:1-61` (components and
potential), `src/tracing/utility.jl:89-99` (Faraday tensor via AD of A_μ).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gradus_tpu.metrics.base import AbstractMetric, metric_dataclass

__all__ = ["KerrNewmanMetric", "faraday_tensor"]


@metric_dataclass
class KerrNewmanMetric(AbstractMetric):
    M: float = 1.0
    a: float = 0.0
    Q: float = 0.0

    def components(self, r, theta):
        M, a, Q = self.M, self.a, self.Q
        R = 2.0 * M
        sin2 = jnp.sin(theta) ** 2
        sigma = r * r + (a * jnp.cos(theta)) ** 2
        delta = r * r - R * r + a * a + Q * Q
        r2a2 = r * r + a * a

        tt = (a * a * sin2 - delta) / sigma
        rr = sigma / delta
        hh = sigma
        pp = (sin2 / sigma) * (r2a2**2 - a * a * sin2 * delta)
        tp = (a * sin2 / sigma) * (delta - r2a2)
        return jnp.stack([tt, rr, hh, pp, tp], axis=-1)

    def inner_radius(self):
        return self.M + jnp.sqrt(self.M**2 - self.a**2 - self.Q**2)

    def electromagnetic_potential(self, r, theta):
        """A_μ = (rQ/Σ)·(1, 0, 0, -a sin²θ)
        (reference `kerr-newman-ad.jl:28-33`)."""
        sigma = r * r + (self.a * jnp.cos(theta)) ** 2
        pref = r * self.Q / sigma
        z = jnp.zeros_like(r)
        return jnp.stack(
            [pref, z, z, -pref * self.a * jnp.sin(theta) ** 2], axis=-1
        )

    def ergosphere_radius(self, theta, positive=True):
        d = self.M**2 - self.a**2 * jnp.cos(theta) ** 2 - self.Q**2
        s = jnp.sqrt(d)
        return self.M + s if positive else self.M - s


def faraday_tensor(m: AbstractMetric, x):
    """F^μ_κ = g^{μσ}(∂_σ A_κ − ∂_κ A_σ) with ∂A from `jax.jacfwd` of the
    potential w.r.t. (r, θ) (reference `src/tracing/utility.jl:89-99`)."""
    rtheta = jnp.stack([x[..., 1], x[..., 2]])

    def pot(rt):
        return m.electromagnetic_potential(rt[0], rt[1])

    dA_rt = jax.jacfwd(pot)(rtheta)  # (4, 2): ∂A_κ/∂(r,θ)
    dA = jnp.zeros((4, 4), dtype=dA_rt.dtype)
    dA = dA.at[:, 1].set(dA_rt[:, 0]).at[:, 2].set(dA_rt[:, 1])  # ∂_σ index second
    # dA[κ, σ] = ∂_σ A_κ ⇒ F_{σκ} = ∂_σ A_κ − ∂_κ A_σ = dA.T − dA
    ginv = m.inverse_metric(x)
    return jnp.matmul(ginv, dA.T - dA, precision=jax.lax.Precision.HIGHEST)
