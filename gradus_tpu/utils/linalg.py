"""Small linear-algebra and coordinate utilities on 4-vectors.

Reference parity: `src/utils.jl` (`_symmetric_matrix`, projections, smooth step,
oblate-spheroid transform) and `src/orthonormalization.jl` dot products — rebuilt
as pure jnp functions that vmap/jit cleanly.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "sym4x4",
    "sym4x4_inverse_components",
    "spherical_to_cartesian",
    "cartesian_to_spherical",
    "cartesian_distance",
    "cartesian_squared_distance",
    "equatorial_project",
    "spinaxis_project",
    "smooth_step_interpolate",
    "oblate_spheroid_to_spherical",
]


def sym4x4(comps):
    """Assemble the symmetric 4x4 metric from its 5 non-zero components
    ``(g_tt, g_rr, g_θθ, g_φφ, g_tφ)``  (reference: `src/utils.jl:60-67`)."""
    comps = jnp.asarray(comps)
    tt, rr, hh, pp, tp = (
        comps[..., 0],
        comps[..., 1],
        comps[..., 2],
        comps[..., 3],
        comps[..., 4],
    )
    z = jnp.zeros_like(tt)
    return jnp.stack(
        [
            jnp.stack([tt, z, z, tp], axis=-1),
            jnp.stack([z, rr, z, z], axis=-1),
            jnp.stack([z, z, hh, z], axis=-1),
            jnp.stack([tp, z, z, pp], axis=-1),
        ],
        axis=-2,
    )


def sym4x4_inverse_components(comps):
    """Closed-form inverse of the 5-component symmetric metric, returning the 5
    inverse components ``(g^tt, g^rr, g^θθ, g^φφ, g^tφ)``.

    Reference: `src/tracing/method-implementations/auto-diff.jl:59-78`
    (symbolically computed inverse)."""
    comps = jnp.asarray(comps)
    g1, g2, g3, g4, g5 = (
        comps[..., 0],
        comps[..., 1],
        comps[..., 2],
        comps[..., 3],
        comps[..., 4],
    )
    det = g1 * g2 * g3 * g4 - (g5 * g5) * g2 * g3
    inv_det = 1.0 / det
    return jnp.stack(
        [
            (g2 * g3 * g4) * inv_det,
            (g1 * g3 * g4 - (g5 * g5) * g3) * inv_det,
            (g1 * g2 * g4 - (g5 * g5) * g2) * inv_det,
            (g1 * g2 * g3) * inv_det,
            (-g2 * g3 * g5) * inv_det,
        ],
        axis=-1,
    )


def spherical_to_cartesian(x):
    """(r, θ, φ) 3-vector (or the spatial part of a 4-vector) → cartesian (x, y, z).

    Reference: `src/utils.jl:79-88`."""
    x = jnp.asarray(x)
    if x.shape[-1] == 4:
        x = x[..., 1:]
    r, th, ph = x[..., 0], x[..., 1], x[..., 2]
    sth = jnp.sin(th)
    return jnp.stack(
        [r * jnp.cos(ph) * sth, r * jnp.sin(ph) * sth, r * jnp.cos(th)], axis=-1
    )


def cartesian_to_spherical(x):
    """(x, y, z) → (r, θ, φ)."""
    x = jnp.asarray(x)
    r = jnp.sqrt(jnp.sum(x * x, axis=-1))
    theta = jnp.arccos(jnp.clip(x[..., 2] / r, -1.0, 1.0))
    phi = jnp.arctan2(x[..., 1], x[..., 0])
    return jnp.stack([r, theta, phi], axis=-1)


def cartesian_squared_distance(x1, x2):
    """Flat-space squared distance between two BL-coordinate positions
    (reference: `src/utils.jl:90-98`)."""
    y1 = spherical_to_cartesian(x1)
    y2 = spherical_to_cartesian(x2)
    d = y2 - y1
    return jnp.sum(d * d, axis=-1)


def cartesian_distance(x1, x2):
    return jnp.sqrt(cartesian_squared_distance(x1, x2))


def equatorial_project(x, signed: bool = False):
    """ρ = r·|sin θ| — cylindrical radius (reference: `src/utils.jl:146-152`)."""
    r, th = x[..., 1], x[..., 2]
    s = jnp.sin(th)
    return r * (s if signed else jnp.abs(s))


def spinaxis_project(x, signed: bool = False):
    """z = r·|cos θ| — height above the equatorial plane
    (reference: `src/utils.jl:154-157`)."""
    r, th = x[..., 1], x[..., 2]
    c = jnp.cos(th)
    return r * (c if signed else jnp.abs(c))


def smooth_step_interpolate(x, x0, dx=2.5, smoothing_offset=1e4):
    """Smoothed 1→0 step centred at ``x0`` over width ``dx``; used by the
    refractive-index and dark-matter metrics so the boundary has a gradient.

    Reference: `_smooth_interpolate`, `src/utils.jl:159-169`."""
    t = (x - x0) / dx
    v = jnp.arctan(smoothing_offset * t) / jnp.pi + 0.5
    mid = 1.0 - v
    return jnp.where(x <= x0 - dx / 2, 1.0, jnp.where(x >= x0 + dx / 2, 0.0, mid))


def oblate_spheroid_to_spherical(x, h, a):
    """Point (x along x-axis, h along z-axis) → (r, θ) in Boyer-Lindquist,
    accounting for the oblate spheroidal coordinates of spinning spacetimes.

    Reference: `src/utils.jl:186-200`."""
    a = jnp.asarray(a, dtype=jnp.result_type(x, h, float))
    r_flat = jnp.sqrt(x * x + h * h)
    theta_flat = jnp.arctan2(x, h)
    a2 = jnp.where(jnp.abs(a) < 1e-12, 1.0, a * a)  # guarded; branch selected below
    cos2 = (jnp.sqrt(4 * a2 * h * h + (h * h + x * x - a2) ** 2) + a2 - h * h - x * x) / (
        2 * a2
    )
    cos_t = jnp.sqrt(jnp.clip(cos2, 0.0, 1.0))
    r_sph = h / jnp.where(cos_t == 0, 1.0, cos_t)
    theta_sph = jnp.arccos(jnp.clip(cos_t, -1.0, 1.0))
    flat = jnp.abs(a) < 1e-12
    return jnp.where(flat, r_flat, r_sph), jnp.where(flat, theta_flat, theta_sph)
