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

__all__ = [
    "linear_interp",
    "nan_tolerant_interp",
    "make_interpolator",
    "enforce_interpolation_bounds",
    "gaussian_kernel",
    "constant_kernel",
    "kernel_interpolate",
]


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


_bounds_warned = [False]


def enforce_interpolation_bounds(r, r_min, r_max, warn: bool = True):
    """Clamp queries to the interpolation domain; warn once (host-side) on
    out-of-bounds concrete inputs (reference `_enforce_interpolation_bounds`,
    `src/interpolations.jl:47-53`). Under jit the clamp applies silently."""
    if warn and not _bounds_warned[0] and not isinstance(r, jax.core.Tracer):
        import numpy as _np

        rv = _np.asarray(r)
        if (rv < r_min).any() or (rv > r_max).any():
            import warnings

            warnings.warn(
                f"Interpolation out of bounds: query ∉ [{r_min}, {r_max}]. "
                "Additional geodesic samples may be required (will not warn "
                "again).",
                stacklevel=2,
            )
            _bounds_warned[0] = True
    return jnp.clip(r, r_min, r_max)


def gaussian_kernel(kernel_size=(5, 5), sigma: float = 1.0, domain=(-5.0, 5.0)):
    """Normalized 2D Gaussian stencil (reference `gaussian_kernel`,
    `src/interpolations.jl:55-67`)."""
    xi = jnp.linspace(domain[0], domain[1], kernel_size[0])
    yj = jnp.linspace(domain[0], domain[1], kernel_size[1])
    k = jnp.exp(-((xi[None, :] / sigma) ** 2 + (yj[:, None] / sigma) ** 2))
    return k / jnp.sum(k)


def constant_kernel(kernel_size=(5, 5)):
    """Normalized box stencil (reference `constant_kernel`,
    `src/interpolations.jl:69-73`)."""
    k = jnp.ones(kernel_size)
    return k / jnp.sum(k)


def kernel_interpolate(data, kernel_size=(5, 5), kf=gaussian_kernel, **kwargs):
    """Fill interior NaN pixels with the kernel-weighted mean of their non-NaN
    neighbours (reference `kernel_interpolate!`,
    `src/interpolations.jl:75-117`) — one pair of convolutions instead of the
    reference's pixel loop; border rows/cols are left untouched, matching the
    reference's interior-only sweep."""
    data = jnp.asarray(data)
    kernel = kf(kernel_size, **kwargs)
    valid = ~jnp.isnan(data)
    data0 = jnp.where(valid, data, 0.0)

    k4 = kernel[None, None, :, :].astype(data0.dtype)

    def conv(img):
        return jax.lax.conv_general_dilated(
            img[None, None, :, :].astype(data0.dtype),
            k4,
            window_strides=(1, 1),
            padding="SAME",
        )[0, 0]

    num = conv(data0)
    den = conv(valid.astype(data0.dtype))
    filled = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)

    hx, hy = kernel_size[0] // 2, kernel_size[1] // 2
    ii = jnp.arange(data.shape[0])[:, None]
    jj = jnp.arange(data.shape[1])[None, :]
    interior = (
        (ii >= hx)
        & (ii < data.shape[0] - hx)
        & (jj >= hy)
        & (jj < data.shape[1] - hy)
    )
    return jnp.where(valid | ~interior, data, filled)
