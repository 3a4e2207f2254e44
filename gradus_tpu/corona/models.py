"""Coronal source models.

Reference: `src/corona/models/lamp-post.jl` (LampPostModel, BeamedPointSource)
and `src/corona/models/extended.jl` (RingCorona, DiscCorona).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gradus_tpu.geodesics.equation import constrain_all
from gradus_tpu.geodesics.tetrads import propernorm
from gradus_tpu.metrics.base import AbstractMetric

__all__ = ["LampPostModel", "BeamedPointSource", "RingCorona", "DiscCorona"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LampPostModel:
    """Static on-axis point source at height h
    (reference lamp-post.jl:1-13)."""

    h: float = 5.0
    theta: float = 0.01
    phi: float = 0.0

    def sample_position_velocity(self, m: AbstractMetric):
        dtype = jnp.result_type(self.h, float)
        x = jnp.asarray([0.0, self.h, self.theta, self.phi], dtype)
        g = m.components(x[1], x[2])
        v = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype) / jnp.sqrt(-g[0])
        return x, v


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BeamedPointSource:
    """Outflowing on-axis point source at radius r with speed β
    (reference lamp-post.jl:25-45): dr/dt = β √(-g_tt/g_rr)."""

    r: float = 5.0
    beta: float = 0.0

    def sample_position_velocity(self, m: AbstractMetric):
        dtype = jnp.result_type(self.r, float)
        x = jnp.asarray([0.0, self.r, 1e-4, 0.0], dtype)
        g = m.components(x[1], x[2])
        drdt = self.beta * jnp.sqrt(-g[0] / g[1])
        vbar = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype).at[1].set(drdt)
        # normalize to timelike: first constrain v^t, then unit-norm
        v = constrain_all(m, x, vbar, mu=1.0)
        nrm = jnp.sqrt(jnp.abs(propernorm(m.metric(x), v)))
        return x, v / nrm


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RingCorona:
    """Off-axis ring source (reference `src/corona/models/extended.jl:61-120`).
    Sampled as a point at (r, θ) rotated around the axis — the axisymmetric
    emissivity is the azimuth-average, which for a static axisymmetric metric
    equals the single-point profile."""

    r: float = 5.0
    h: float = 5.0

    def sample_position_velocity(self, m: AbstractMetric):
        dtype = jnp.result_type(self.r, float)
        rr = jnp.sqrt(self.r**2 + self.h**2)
        theta = jnp.arctan2(self.r, self.h)
        x = jnp.stack(
            [jnp.asarray(0.0, dtype), rr, theta, jnp.asarray(0.0, dtype)]
        )
        g = m.components(x[1], x[2])
        v = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype) / jnp.sqrt(-g[0])
        return x, v


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiscCorona:
    """Extended disc corona of radius r at height h — a stack of rings
    (reference extended.jl:121-203)."""

    r: float = 10.0
    h: float = 5.0
    n_rings: int = dataclasses.field(default=10, metadata=dict(static=True))

    def rings(self):
        import numpy as np

        # even-area ring radii
        edges = np.sqrt(np.linspace(0.0, 1.0, self.n_rings + 1)) * self.r
        centers = 0.5 * (edges[1:] + edges[:-1])
        return [RingCorona(r=float(rc), h=self.h) for rc in centers]
