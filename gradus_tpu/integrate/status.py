"""Per-geodesic status codes — the reference's `StatusCodes` enum
(`src/Gradus.jl:59-64`) as plain ints (hashable for jit statics; promoted to
int32 arrays inside computations)."""

from __future__ import annotations

__all__ = ["StatusCodes"]


class StatusCodes:
    NoStatus = 0
    OutOfDomain = 1
    WithinInnerBoundary = 2
    IntersectedWithGeometry = 3
