"""1D spacing generators for image planes and radial discretisations.

Reference: `src/image-planes/grids.jl` (GeometricGrid, InverseGrid — default
for transfer-function radii —, LinearGrid, SinGrid, CosGrid, LogisticGrid).
Each grid is a callable ``grid(min, max, N) -> (N,) array``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "LinearGrid",
    "GeometricGrid",
    "InverseGrid",
    "SinGrid",
    "CosGrid",
    "LogisticGrid",
]


class LinearGrid:
    def __call__(self, lo, hi, N):
        return jnp.linspace(lo, hi, N)


class GeometricGrid:
    def __call__(self, lo, hi, N):
        K = (hi / lo) ** (1.0 / (N - 1))
        return lo * K ** jnp.arange(N)


class InverseGrid:
    def __call__(self, lo, hi, N):
        return 1.0 / jnp.linspace(1.0 / hi, 1.0 / lo, N)[::-1]


class SinGrid:
    def __call__(self, lo, hi, N):
        p = jnp.linspace(-jnp.pi / 2, jnp.pi / 2, N)
        return ((jnp.sin(p) + 1.0) / 2.0) * (hi - lo) + lo


class CosGrid:
    def __call__(self, lo, hi, N):
        x = jnp.linspace(0.0, 4 * jnp.pi, N)
        return (jnp.cos(x - jnp.pi / 2) + x) / (4 * jnp.pi) * (hi - lo) + lo


class LogisticGrid:
    def __init__(self, k=0.5):
        self.k = k

    def __call__(self, lo, hi, N):
        y = jnp.linspace(-10.0, 10.0, N)
        return (hi - lo) / (1.0 + jnp.exp(-self.k * y)) + lo
