"""Tsitouras 5(4) Runge-Kutta step, batched over the ray axis.

Same method family/tolerances as the reference's default solver (OrdinaryDiffEq
Tsit5, `src/tracing/configuration.jl:99`), re-implemented as fixed-shape array
ops: all rays advance in lockstep, each with its own dt and error state.
Coefficients from Tsitouras (2011), "Runge-Kutta pairs of order 5(4) satisfying
only the first column simplifying assumption".
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["tsit5_step", "hermite_interp", "initial_dt", "TSIT5_C"]

# --- tableau -----------------------------------------------------------------
TSIT5_C = (0.0, 0.161, 0.327, 0.9, 0.9800255409045097, 1.0, 1.0)

_A = (
    (0.161,),
    (-0.008480655492356989, 0.335480655492357),
    (2.8971530571054935, -6.359448489975075, 4.3622954328695815),
    (5.325864828439257, -11.748883564062828, 7.4955393428898365, -0.09249506636175525),
    (
        5.86145544294642,
        -12.92096931784711,
        8.159367898576159,
        -0.071584973281401,
        -0.028269050394068383,
    ),
    (
        0.09646076681806523,
        0.01,
        0.4798896504144996,
        1.379008574103742,
        -3.290069515436081,
        2.324710524099774,
    ),
)

# b - bhat: error-estimate weights (embedded 4th-order comparison)
_BTILDE = (
    -0.00178001105222577714,
    -0.0008164344596567469,
    0.007880878010261995,
    -0.1447110071732629,
    0.5823571654525552,
    -0.45808210592918697,
    0.015151515151515152,
)


def tsit5_step(f, y, dt, k1=None):
    """One Tsit5 step for every ray.

    Parameters
    ----------
    f : callable
        RHS, ``f(y) -> dy`` with ``y`` of shape ``(..., S)``; autonomous (the
        geodesic equation does not depend on λ).
    y : (..., S) state
    dt : (...) per-ray step size
    k1 : optional FSAL cache — ``f(y)`` from the previous accepted step.

    Returns ``(y_new, err_vec, k1, k7)`` where ``err_vec`` is the raw embedded
    error estimate (same shape as y) and ``k7 = f(y_new)`` (FSAL).
    """
    dt_ = dt[..., None]
    if k1 is None:
        k1 = f(y)
    k2 = f(y + dt_ * (_A[0][0] * k1))
    k3 = f(y + dt_ * (_A[1][0] * k1 + _A[1][1] * k2))
    k4 = f(y + dt_ * (_A[2][0] * k1 + _A[2][1] * k2 + _A[2][2] * k3))
    k5 = f(y + dt_ * (_A[3][0] * k1 + _A[3][1] * k2 + _A[3][2] * k3 + _A[3][3] * k4))
    k6 = f(
        y
        + dt_
        * (
            _A[4][0] * k1
            + _A[4][1] * k2
            + _A[4][2] * k3
            + _A[4][3] * k4
            + _A[4][4] * k5
        )
    )
    y_new = y + dt_ * (
        _A[5][0] * k1
        + _A[5][1] * k2
        + _A[5][2] * k3
        + _A[5][3] * k4
        + _A[5][4] * k5
        + _A[5][5] * k6
    )
    k7 = f(y_new)
    err_vec = dt_ * (
        _BTILDE[0] * k1
        + _BTILDE[1] * k2
        + _BTILDE[2] * k3
        + _BTILDE[3] * k4
        + _BTILDE[4] * k5
        + _BTILDE[5] * k6
        + _BTILDE[6] * k7
    )
    return y_new, err_vec, k1, k7


def hermite_interp(theta, y0, y1, f0, f1, dt):
    """Cubic Hermite interpolation on one step: θ ∈ [0, 1] → y(λ0 + θ·dt).

    Used for event localisation (the reference uses the integrator interpolant
    through ContinuousCallback, `src/geometry/bootstrap.jl:43-63`)."""
    th = theta[..., None] if jnp.ndim(theta) == jnp.ndim(dt) else theta
    dt_ = dt[..., None]
    h00 = (1 + 2 * th) * (1 - th) ** 2
    h10 = th * (1 - th) ** 2
    h01 = th * th * (3 - 2 * th)
    h11 = th * th * (th - 1)
    return h00 * y0 + h10 * dt_ * f0 + h01 * y1 + h11 * dt_ * f1


def initial_dt(f, y, abstol, reltol, order: int = 5):
    """Hairer-Nørsett-Wanner automatic initial step size (II.4), batched."""
    sc = abstol + jnp.abs(y) * reltol
    f0 = f(y)
    d0 = jnp.sqrt(jnp.mean((y / sc) ** 2, axis=-1))
    d1 = jnp.sqrt(jnp.mean((f0 / sc) ** 2, axis=-1))
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / jnp.maximum(d1, 1e-30))
    y1 = y + h0[..., None] * f0
    f1 = f(y1)
    d2 = jnp.sqrt(jnp.mean(((f1 - f0) / sc) ** 2, axis=-1)) / h0
    dmax = jnp.maximum(d1, d2)
    h1 = jnp.where(
        dmax <= 1e-15,
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / dmax) ** (1.0 / order),
    )
    return jnp.minimum(100.0 * h0, h1)
