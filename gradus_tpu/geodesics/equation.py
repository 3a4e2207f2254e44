"""The core numeric kernel: geodesic acceleration from AD of the metric.

The reference (`src/tracing/method-implementations/auto-diff.jl`) computes the
metric Jacobian with ForwardDiff duals and expands the Christoffel contraction
symbolically at compile time. Here the same mathematics is two `jax.jvp` passes
through the metric components plus a closed-form contraction — XLA fuses the
whole thing into one elementwise kernel across the ray batch.

For a static axis-symmetric metric (∂_t g = ∂_φ g = 0) the geodesic equation

    a^μ = -Γ^μ_{νσ} v^ν v^σ,
    Γ^μ_{νσ} = ½ g^{μρ} (∂_ν g_{ρσ} + ∂_σ g_{ρν} − ∂_ρ g_{νσ})

reduces (using the v↔v symmetry) to

    a^μ = -g^{μρ} [ (v^r ∂_r g_{ρσ} + v^θ ∂_θ g_{ρσ}) v^σ
                    − ½ δ_ρ∈{r,θ} (v ∂_ρ g v) ].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gradus_tpu.metrics.base import AbstractMetric
from gradus_tpu.utils.linalg import sym4x4, sym4x4_inverse_components

__all__ = [
    "metric_jacobian",
    "geodesic_equation",
    "constrain_time",
    "constrain",
    "constrain_all",
]


def metric_jacobian(m: AbstractMetric, r, theta):
    """Value + (∂_r, ∂_θ) of the 5 metric components in two forward-mode passes
    (reference `metric_jacobian`, auto-diff.jl:206-211)."""
    dtype = jnp.result_type(r, theta, float)
    rt = jnp.stack(
        jnp.broadcast_arrays(jnp.asarray(r, dtype), jnp.asarray(theta, dtype))
    )

    def f(rt):
        return m.components(rt[0], rt[1])

    ones = jnp.ones_like(rt[0])
    zeros = jnp.zeros_like(rt[0])
    g, dg_dr = jax.jvp(f, (rt,), (jnp.stack([ones, zeros]),))
    _, dg_dtheta = jax.jvp(f, (rt,), (jnp.stack([zeros, ones]),))
    return g, dg_dr, dg_dtheta


def geodesic_equation(m: AbstractMetric, x, v):
    """Four-acceleration a^μ = -Γ^μ_{νσ} v^ν v^σ at position ``x`` with
    velocity ``v`` (both 4-vectors).

    Reference: `geodesic_equation` + `compute_geodesic_equation`,
    auto-diff.jl:115-141, 213-224."""
    g, dgr, dgth = metric_jacobian(m, x[..., 1], x[..., 2])
    ginv = sym4x4(sym4x4_inverse_components(g))
    J1 = sym4x4(dgr)
    J2 = sym4x4(dgth)

    # A_ρ = ∂_ν g_{ρσ} v^ν v^σ  (only ν ∈ {r, θ} contribute)
    A = v[..., 1, None] * (J1 @ v[..., None])[..., 0] + v[..., 2, None] * (
        J2 @ v[..., None]
    )[..., 0]
    # B_ρ = ∂_ρ g_{νσ} v^ν v^σ  (nonzero only for ρ ∈ {r, θ})
    q1 = jnp.einsum("...i,...ij,...j->...", v, J1, v)
    q2 = jnp.einsum("...i,...ij,...j->...", v, J2, v)
    B = jnp.stack(
        [jnp.zeros_like(q1), q1, q2, jnp.zeros_like(q1)], axis=-1
    )
    return -(ginv @ (A - 0.5 * B)[..., None])[..., 0]


def constrain_time(g_comps, v, mu=0.0, positive: bool = True):
    """Solve g_{σν} v^σ v^ν = -μ² for v^t (quadratic; reference
    `constrain_time`, auto-diff.jl:161-179)."""
    g1, g2, g3, g4, g5 = (
        g_comps[..., 0],
        g_comps[..., 1],
        g_comps[..., 2],
        g_comps[..., 3],
        g_comps[..., 4],
    )
    disc = (
        -g1 * g2 * v[..., 1] ** 2
        - g1 * g3 * v[..., 2] ** 2
        - g1 * mu**2
        - (g1 * g4 - g5 * g5) * v[..., 3] ** 2
    )
    root = jnp.sqrt(disc)
    if positive:
        return -(g5 * v[..., 3] + root) / g1
    return -(g5 * v[..., 3] - root) / g1


def constrain(m: AbstractMetric, x, v, mu=0.0):
    """v^t such that the velocity satisfies the norm constraint at ``x``."""
    g = m.components(x[..., 1], x[..., 2])
    return constrain_time(g, v, mu)


def constrain_all(m: AbstractMetric, x, v, mu=0.0):
    """Replace the time component of ``v`` with the constrained value
    (reference `constrain_all`, `src/tracing/constraints.jl:14-31`)."""
    vt = constrain(m, x, v, mu)
    return v.at[..., 0].set(vt)
