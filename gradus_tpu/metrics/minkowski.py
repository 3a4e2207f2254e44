"""Flat-space (Minkowski) metrics in spherical and cartesian coordinates.

Reference: `src/metrics/minkowski.jl:1-43`.
"""

from __future__ import annotations

import jax.numpy as jnp

from gradus_tpu.metrics.base import AbstractMetric, metric_dataclass

__all__ = ["SphericalMetric", "CartesianMetric", "minkowski_matrix"]


@metric_dataclass
class SphericalMetric(AbstractMetric):
    def components(self, r, theta):
        one = jnp.ones_like(r)
        return jnp.stack(
            [-one, one, r * r, (r * jnp.sin(theta)) ** 2, jnp.zeros_like(r)], axis=-1
        )

    def inner_radius(self):
        return 1e-12

    def isco(self):
        return 0.0


@metric_dataclass
class CartesianMetric(AbstractMetric):
    coords = "cartesian"

    def components(self, r, theta):
        one = jnp.ones_like(r)
        # diag(-1, 1, 1, 1); the 5th slot (tφ) is zero
        return jnp.stack([-one, one, one, one, jnp.zeros_like(r)], axis=-1)

    def inner_radius(self):
        return 1e-12

    def isco(self):
        return 0.0


def minkowski_matrix(dtype=float):
    return jnp.diag(jnp.asarray([-1.0, 1.0, 1.0, 1.0], dtype=dtype))
