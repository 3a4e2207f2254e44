"""Polygon utilities: shoelace area, orientation, in-polygon, barycenter.

Reference: `src/geometry/geometry.jl:55-123` (`getorientation`, `getarea`,
`inpolygon`, `getbarycenter`) — consumed by the mesh and plotting paths.
Vectorized: polygons are (V, 2) vertex arrays; query points broadcast over
leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "polygon_area",
    "polygon_barycenter",
    "orientation",
    "in_polygon",
]


def polygon_area(poly):
    """Shoelace area of a (V, 2) vertex loop (reference `getarea`,
    geometry.jl:97-107)."""
    p = jnp.asarray(poly)
    q = jnp.roll(p, -1, axis=-2)
    cross = p[..., 0] * q[..., 1] - q[..., 0] * p[..., 1]
    return jnp.abs(0.5 * jnp.sum(cross, axis=-1))


def polygon_barycenter(poly):
    """Vertex centroid (reference `getbarycenter`, geometry.jl:109-121)."""
    return jnp.mean(jnp.asarray(poly), axis=-2)


def orientation(p1, p2, p):
    """Side of the directed line p1→p2 the point p lies on: +1 / −1
    (reference branchless `getorientation`, geometry.jl:51-61)."""
    p1 = jnp.asarray(p1)
    p2 = jnp.asarray(p2)
    p = jnp.asarray(p)
    o = p - p1
    b = p1 - p2
    t = b[..., 1] * o[..., 0] - b[..., 0] * o[..., 1]
    return jnp.where(t < 0, 1, -1)


def in_polygon(poly, p):
    """True where the point(s) ``p`` (..., 2) lie inside the CONVEX polygon
    ``poly`` (V, 2): every edge sees the point on the same side (reference
    `inpolygon`, geometry.jl:86-95 — same convexity contract)."""
    poly = jnp.asarray(poly)
    p = jnp.asarray(p)
    lead = p.shape[:-1]
    pf = p.reshape(-1, 2)  # (N, 2) — any number of leading batch axes
    a = poly  # (V, 2) edge starts
    b = jnp.roll(poly, -1, axis=0)  # edge ends
    sides = orientation(a[:, None, :], b[:, None, :], pf[None, :, :])  # (V, N)
    inside = jnp.all(sides == sides[0], axis=0)  # (N,)
    return inside.reshape(lead)
