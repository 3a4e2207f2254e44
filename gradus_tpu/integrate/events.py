"""Event localisation on one integrator step.

The reference localises surface crossings by sampling the step interpolant at
``interp_points = 8`` and bisecting the first sign change
(`src/geometry/bootstrap.jl:43-63`, SciML ContinuousCallback). Sampling the
8-component Hermite interpolant ~18 times per step per ray dominates the event
cost in a lockstep batch.

This module replaces that with an *analytic* treatment of the same model: the
signed crossing indicator c(θ) along the step is itself a cubic Hermite
(values + derivatives of c at the step endpoints, the derivative being one
forward-mode pass ∇c·f). A cubic's interior extrema are the roots of a
quadratic, so the first sign change on [0, 1] — including enter-and-exit pairs
the 8-point scan can miss — is found exactly from 4 polynomial evaluations,
then polished by bisection on the cubic. Cost per step: one jvp of the
crossing function (the left-endpoint values are FSAL-reused) + ~100 flops,
~10x cheaper than interpolant sampling, with strictly better detection.

Shared by the XLA solver (`solver.py`) and the Pallas kernel
(`pallas_solver.py`); everything is elementwise over the ray batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cubic_first_crossing"]


def cubic_first_crossing(c0, m0, c1, m1, bisect_iters: int = 26):
    """First sign change in (0, 1] of the Hermite cubic with c(0)=c0,
    c'(0)=m0, c(1)=c1, c'(1)=m1 (θ-derivatives, i.e. dλ-derivatives × dt).

    Returns ``(found, theta)`` — elementwise bool mask and crossing location
    (0 where not found)."""
    a = 2.0 * c0 - 2.0 * c1 + m0 + m1
    b = -3.0 * c0 + 3.0 * c1 - 2.0 * m0 - m1
    c = m0

    def poly(th):
        return ((a * th + b) * th + c) * th + c0

    # interior extrema: roots of 3aθ² + 2bθ + c
    A = 3.0 * a
    B = 2.0 * b
    disc = B * B - 4.0 * A * c
    real = disc >= 0.0
    # double-where: sqrt must never SEE a clamped-to-zero operand, or its
    # infinite slope turns the zero cotangent of the untaken branch into NaN
    # in reverse mode (0 × ∞)
    sq = jnp.sqrt(jnp.where(real, jnp.maximum(disc, 0.0), 1.0))
    sq = jnp.where(real, sq, 0.0)
    tiny = jnp.abs(A) < 1e-30 * (1.0 + jnp.abs(B))
    safe_A = jnp.where(tiny, 1.0, A)
    r1 = (-B - sq) / (2.0 * safe_A)
    r2 = (-B + sq) / (2.0 * safe_A)
    # quadratic (a≈0) case: single extremum at -c/B
    lin = -c / jnp.where(jnp.abs(B) < 1e-30, 1.0, B)
    r1 = jnp.where(tiny, lin, r1)
    r2 = jnp.where(tiny, lin, r2)
    r1 = jnp.where(real, r1, 0.0)
    r2 = jnp.where(real, r2, 0.0)
    t1 = jnp.clip(jnp.minimum(r1, r2), 0.0, 1.0)
    t2 = jnp.clip(jnp.maximum(r1, r2), 0.0, 1.0)

    # scan the ≤3 monotone segments for the first sign change
    nodes = (jnp.zeros_like(c0), t1, t2, jnp.ones_like(c0))
    vals = (c0, poly(t1), poly(t2), c1)
    found = jnp.zeros(jnp.shape(c0), bool)
    th_lo = jnp.zeros_like(c0)
    th_hi = jnp.ones_like(c0)
    c_lo = c0
    for k in range(3):
        sc = ((vals[k] < 0) != (vals[k + 1] < 0)) & ~found
        th_lo = jnp.where(sc, nodes[k], th_lo)
        th_hi = jnp.where(sc, nodes[k + 1], th_hi)
        c_lo = jnp.where(sc, vals[k], c_lo)
        found = found | sc

    # bisection on the cubic (pure polynomial evaluations)
    def bis(_, st):
        lo, hi, cl = st
        mid = 0.5 * (lo + hi)
        cm = poly(mid)
        same = (cm < 0) == (cl < 0)
        return (
            jnp.where(same, mid, lo),
            jnp.where(same, hi, mid),
            jnp.where(same, cm, cl),
        )

    lo, hi, _ = jax.lax.fori_loop(0, bisect_iters, bis, (th_lo, th_hi, c_lo))
    theta = jnp.where(found, 0.5 * (lo + hi), 0.0)
    return found, theta
