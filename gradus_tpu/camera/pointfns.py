"""Point functions: vectorized maps GeodesicPoint-batch → per-ray values, with
a composition algebra.

Reference: `src/point-functions.jl` (PointFunction / FilterPointFunction with
`∘` chaining) and `src/const-point-functions.jl`. Composition here uses `@`
(Python has no `∘`): ``pf2 @ pf1`` evaluates pf1 first, exactly like the
reference's ``pf2 ∘ pf1``. Filters short-circuit to their default value via
`jnp.where` — NaN masking instead of control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

from gradus_tpu.integrate.status import StatusCodes

__all__ = [
    "PointFunction",
    "FilterPointFunction",
    "FilterStatusCode",
    "ConstPointFunctions",
]


class AbstractPointFunction:
    def __call__(self, m, gp, max_time, **kwargs):
        raise NotImplementedError

    def __matmul__(self, other):
        """self @ other — evaluate `other` first, pass its value on."""
        return _ComposedPointFunction(self, other)


class PointFunction(AbstractPointFunction):
    def __init__(self, f):
        self.f = f

    def __call__(self, m, gp, max_time, **kwargs):
        return self.f(m, gp, max_time, **kwargs)


class FilterPointFunction(AbstractPointFunction):
    """Boolean predicate; when False the chain output becomes `default`
    (reference `FilterPointFunction`, point-functions.jl:44-70)."""

    def __init__(self, f, default=jnp.nan):
        self.f = f
        self.default = default

    def __call__(self, m, gp, max_time, **kwargs):
        return self.f(m, gp, max_time, **kwargs)


class _ComposedPointFunction(AbstractPointFunction):
    def __init__(self, outer, inner):
        self.outer = outer
        self.inner = inner

    def __call__(self, m, gp, max_time, **kwargs):
        if isinstance(self.inner, FilterPointFunction):
            mask = self.inner(m, gp, max_time, **kwargs)
            value = self.outer(m, gp, max_time, **kwargs)
            return jnp.where(mask, value, self.inner.default)
        value = self.inner(m, gp, max_time, **kwargs)
        return self.outer(m, gp, max_time, value=value, **kwargs)


def FilterStatusCode(code, default=jnp.nan):
    return FilterPointFunction(lambda m, gp, t, **kw: gp.status == code, default)


class ConstPointFunctions:
    """Default point functions (reference `src/const-point-functions.jl`)."""

    @staticmethod
    def filter_early_term(default=jnp.nan):
        """Keep only geodesics that terminated before λmax."""
        return FilterPointFunction(
            lambda m, gp, max_time, **kw: gp.lam_max < max_time, default
        )

    @staticmethod
    def filter_intersected(default=jnp.nan):
        return FilterStatusCode(StatusCodes.IntersectedWithGeometry, default)

    @staticmethod
    def affine_time():
        return PointFunction(lambda m, gp, max_time, **kw: gp.lam_max)

    @staticmethod
    def shadow():
        """Affine time where the geodesic terminated early, NaN elsewhere —
        colours the black-hole shadow (reference const-point-functions.jl:60-70)."""
        return ConstPointFunctions.affine_time() @ ConstPointFunctions.filter_early_term()

    @staticmethod
    def redshift(m, x_obs):
        from gradus_tpu.redshift import redshift_pointfunction

        return redshift_pointfunction(m, x_obs)
