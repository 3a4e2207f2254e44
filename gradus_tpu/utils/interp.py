"""NaN-tolerant linear interpolation as fixed-shape array ops.

The reference's workhorse interpolator (`src/interpolations.jl:1-53`,
`NaNLinearInterpolator` + `_make_interpolation`) skips NaN values and clamps
out-of-bounds queries. Here: `searchsorted` on a sorted knot vector with masked
NaN handling — fully vmappable and differentiable w.r.t. the values.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["linear_interp", "nan_tolerant_interp", "make_interpolator"]


def linear_interp(xq, xs, ys):
    """Piecewise-linear interpolation of ``ys(xs)`` at ``xq``; clamps to the
    boundary values outside the domain (reference clamp semantics:
    `src/interpolations.jl:47-53`)."""
    xq = jnp.asarray(xq)
    idx = jnp.clip(jnp.searchsorted(xs, xq, side="right") - 1, 0, xs.shape[0] - 2)
    x0 = xs[idx]
    x1 = xs[idx + 1]
    y0 = ys[..., idx]
    y1 = ys[..., idx + 1]
    w = jnp.where(x1 == x0, 0.0, (xq - x0) / jnp.where(x1 == x0, 1.0, x1 - x0))
    w = jnp.clip(w, 0.0, 1.0)
    return y0 + w * (y1 - y0)


def nan_tolerant_interp(xq, xs, ys):
    """Linear interpolation that skips NaN knots: at a query point, walks to the
    nearest non-NaN knots on either side (reference `_interpolate`,
    `src/interpolations.jl:12-30`).

    Implemented by masking: for each query, select among knots with NaN values
    replaced by the nearest valid neighbour's value. Knot positions with NaN
    values are effectively removed by a prefix/suffix fill.
    """
    valid = ~jnp.isnan(ys)
    # forward-fill then backward-fill NaN values so every knot has a value
    def ffill(carry, yv):
        y, v = yv
        filled = jnp.where(v, y, carry)
        return filled, filled

    init = ys[jnp.argmax(valid)]  # first valid value
    _, fwd = jax.lax.scan(ffill, init, (ys, valid))
    initb = ys[ys.shape[0] - 1 - jnp.argmax(valid[::-1])]
    _, bwd_rev = jax.lax.scan(ffill, initb, (ys[::-1], valid[::-1]))
    bwd = bwd_rev[::-1]
    # average of fills is exact where valid; a reasonable bridge elsewhere
    ys_filled = jnp.where(valid, ys, 0.5 * (fwd + bwd))
    return linear_interp(xq, xs, ys_filled)


def masked_sorted_interp(xq, xs, ys, n):
    """Linear interpolation on a sorted knot array whose valid prefix has
    length ``n`` (invalid tail is +inf). Queries clamp to the valid range."""
    idx = jnp.clip(jnp.searchsorted(xs, xq, side="right") - 1, 0, n - 2)
    x0, x1 = xs[idx], xs[idx + 1]
    w = jnp.clip((xq - x0) / jnp.where(x1 <= x0, 1.0, x1 - x0), 0.0, 1.0)
    return ys[idx] * (1 - w) + ys[idx + 1] * w


def make_interpolator(xs, ys, nan_tolerant: bool = False):
    """Closure form mirroring the reference's `_make_interpolation`
    (`src/interpolations.jl:39-45`)."""
    if nan_tolerant:
        return partial(nan_tolerant_interp, xs=xs, ys=ys)
    return partial(linear_interp, xs=xs, ys=ys)
