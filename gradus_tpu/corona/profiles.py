"""Radial disc profiles: ε(r) and t(r) built from corona traces.

Reference: `src/corona/radial.jl` (`RadialDiscProfile` with r→ε and r→t
interpolants) and `src/corona/analytic.jl`. Fixed-shape arrays with a valid
prefix count replace the reference's ragged filtered vectors.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from gradus_tpu.utils.interp import masked_sorted_interp

__all__ = ["RadialDiscProfile", "AnalyticRadialDiscProfile"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RadialDiscProfile:
    """Sorted (radii, ε, t) arrays with valid prefix length n
    (invalid tail radii = +inf)."""

    radii: Any
    eps: Any
    t: Any
    n: Any  # int32 valid count

    def emissivity_at(self, r):
        return masked_sorted_interp(jnp.asarray(r), self.radii, self.eps, self.n)

    def coordtime_at(self, r):
        return masked_sorted_interp(jnp.asarray(r), self.radii, self.t, self.n)

    def __repr__(self):
        # reference show method parity (radial.jl:279-287)
        try:
            import numpy as _np

            n = int(_np.asarray(self.n))
            r = _np.asarray(self.radii)[:n]
            return (
                "RadialDiscProfile\n"
                f"  . N samples    : {n}\n"
                f"  . r (min, max) : ({r.min():.4g}, {r.max():.4g})"
            )
        except Exception:
            return object.__repr__(self)


def _zero_time(r):
    return jnp.zeros_like(r)


@dataclasses.dataclass(frozen=True)
class AnalyticRadialDiscProfile:
    """Wrap analytic ε(r) (and optionally t(r)) callables
    (reference `src/corona/analytic.jl`)."""

    eps_fn: Callable
    t_fn: Callable = _zero_time

    def emissivity_at(self, r):
        return self.eps_fn(jnp.asarray(r))

    def coordtime_at(self, r):
        return self.t_fn(jnp.asarray(r))
