"""Per-geodesic status codes — the reference's `StatusCodes` enum
(`src/Gradus.jl:59-64`) as int32 constants for array predicates."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["StatusCodes"]


class StatusCodes:
    NoStatus = jnp.int32(0)
    OutOfDomain = jnp.int32(1)
    WithinInnerBoundary = jnp.int32(2)
    IntersectedWithGeometry = jnp.int32(3)
