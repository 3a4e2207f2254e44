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
    """Off-axis ring source (reference `src/corona/models/extended.jl:61-84`):
    an infinitely thin ring of cylindrical radius r at height h. The source
    point sits at spherical (√(r²+h²), atan2(r, h)); its velocity is either
    Keplerian co-rotation of the cylinder (the reference default,
    `SourceVelocities.co_rotating`) or stationary."""

    r: float = 5.0
    h: float = 5.0
    vf: str = dataclasses.field(default="co_rotating", metadata=dict(static=True))

    def sample_position_velocity(self, m: AbstractMetric):
        from gradus_tpu.corona.extended import source_velocity

        dtype = jnp.result_type(self.r, float)
        rr = jnp.sqrt(self.r**2 + self.h**2)
        theta = jnp.arctan2(self.r, self.h)
        x = jnp.stack(
            [jnp.asarray(0.0, dtype), rr, theta, jnp.asarray(0.0, dtype)]
        )
        return x, source_velocity(m, x, self.vf)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiscCorona:
    """Extended disc corona of radius r at height h — a stack of rings
    (reference extended.jl:164-200)."""

    r: float = 10.0
    h: float = 5.0
    vf: str = dataclasses.field(default="co_rotating", metadata=dict(static=True))

    def sample_position_velocity(self, m: AbstractMetric):
        """Representative source point for Monte-Carlo sampling. The reference
        draws a uniform random cylindrical radius (extended.jl:178-184); here
        the deterministic area-median radius r/√2 keeps the path jit-pure —
        the ring-stack `emissivity_profile` is the production algorithm."""
        from gradus_tpu.corona.extended import source_velocity

        dtype = jnp.result_type(self.r, float)
        rho = jnp.asarray(self.r / jnp.sqrt(2.0), dtype)
        rr = jnp.sqrt(rho**2 + self.h**2)
        theta = jnp.arctan2(rho, jnp.asarray(self.h, dtype))
        x = jnp.stack(
            [jnp.asarray(0.0, dtype), rr, theta, jnp.asarray(0.0, dtype)]
        )
        return x, source_velocity(m, x, self.vf)
