"""Tetrad frames, the locally non-rotating frame (LNRF), and metric dot products.

Reference: `src/orthonormalization.jl`. The generic frame uses Gram-Schmidt with
seeds (v, e_r, e_θ, e_φ); the LNRF frame/basis use the Bardeen closed forms —
cheaper and exactly orthonormal, replacing the reference's permutation-based
Gram-Schmidt bootstrap (`orthonormalization.jl:75-123`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gradus_tpu.metrics.base import AbstractMetric

__all__ = [
    "dotproduct",
    "propernorm",
    "mproject",
    "gramschmidt",
    "tetradframe",
    "tetradframe_matrix",
    "lnrframe",
    "lnrbasis",
    "lnrbasis_matrix",
    "lnrframe_matrix",
    "lowerindices",
    "raiseindices",
]


def dotproduct(g, v1, v2):
    """g_{μν} v1^μ v2^ν for a 4x4 metric matrix ``g``."""
    return jnp.einsum(
        "...ij,...i,...j->...", g, v1, v2, precision=jax.lax.Precision.HIGHEST
    )


def propernorm(g, v):
    return dotproduct(g, v, v)


def mproject(g, v, u):
    """Project ``v`` onto ``u`` under ``g`` (reference
    `orthonormalization.jl:20-26`)."""
    return dotproduct(g, v, u) / propernorm(g, u)


def gramschmidt(v, basis, g, passes: int = 2):
    """Orthonormalize ``v`` against the (already orthonormal-ish) ``basis``
    under metric ``g``. Fixed-pass re-projection replaces the reference's
    while-loop tolerance check (`orthonormalization.jl:37-48`) for jit."""
    for _ in range(passes):
        p = jnp.zeros_like(v)
        for e in basis:
            p = p + mproject(g, v, e)[..., None] * e
        v = v - p
    norm = jnp.sqrt(jnp.abs(propernorm(g, v)))
    return v / norm[..., None]


def _basis_vec(i, like):
    e = jnp.zeros_like(like)
    return e.at[..., i].set(1.0)


def tetradframe(m: AbstractMetric, x, v):
    """Orthonormal tetrad (e_t, e_r, e_θ, e_φ) whose first leg is ``v``
    (must be timelike with v^t ≠ 0).

    Reference: `tetradframe`, `orthonormalization.jl:75-104`."""
    g = m.metric(x)
    v1 = v / jnp.sqrt(jnp.abs(propernorm(g, v)))[..., None]
    v2 = gramschmidt(_basis_vec(1, v), (v1,), g)
    v3 = gramschmidt(_basis_vec(2, v), (v1, v2), g)
    v4 = gramschmidt(_basis_vec(3, v), (v1, v2, v3), g)
    return v1, v2, v3, v4


def tetradframe_matrix(m: AbstractMetric, x, v):
    """Columns are the tetrad legs."""
    return jnp.stack(tetradframe(m, x, v), axis=-1)


def _lnrf_quantities(g):
    g_tt, g_rr, g_hh, g_pp, g_tp = (
        g[..., 0, 0],
        g[..., 1, 1],
        g[..., 2, 2],
        g[..., 3, 3],
        g[..., 0, 3],
    )
    omega = -g_tp / g_pp
    # norm of (1,0,0,ω): g_tt + 2ω g_tφ + ω² g_φφ = g_tt + ω g_tφ  (< 0)
    nrm2 = g_tt + omega * g_tp
    alpha = jnp.sqrt(-nrm2)  # lapse
    return omega, alpha, g_rr, g_hh, g_pp, g_tp


def lnrframe(m: AbstractMetric, x):
    """LNRF tetrad vectors (indices up): the zero-angular-momentum observer
    frame (Bardeen 1972; reference `lnrframe`, `orthonormalization.jl:108-115`)."""
    g = m.metric(x)
    omega, alpha, g_rr, g_hh, g_pp, _ = _lnrf_quantities(g)
    z = jnp.zeros_like(alpha)
    et = jnp.stack([1.0 / alpha, z, z, omega / alpha], axis=-1)
    er = jnp.stack([z, 1.0 / jnp.sqrt(g_rr), z, z], axis=-1)
    eh = jnp.stack([z, z, 1.0 / jnp.sqrt(g_hh), z], axis=-1)
    ep = jnp.stack([z, z, z, 1.0 / jnp.sqrt(g_pp)], axis=-1)
    return et, er, eh, ep


def lnrbasis(m: AbstractMetric, x):
    """LNRF dual co-basis one-forms e^{(ν)}_μ (indices down), i.e. the matrix
    that maps local momentum components p_{(ν)} to global covariant p_μ.

    Closed forms: e^{(t)} = α dt, e^{(r)} = √g_rr dr, e^{(θ)} = √g_θθ dθ,
    e^{(φ)} = (g_tφ/√g_φφ) dt + √g_φφ dφ.
    (Reference `lnrbasis`, `orthonormalization.jl:118-123`.)"""
    g = m.metric(x)
    omega, alpha, g_rr, g_hh, g_pp, g_tp = _lnrf_quantities(g)
    z = jnp.zeros_like(alpha)
    et = jnp.stack([alpha, z, z, z], axis=-1)
    er = jnp.stack([z, jnp.sqrt(g_rr), z, z], axis=-1)
    eh = jnp.stack([z, z, jnp.sqrt(g_hh), z], axis=-1)
    ep = jnp.stack([g_tp / jnp.sqrt(g_pp), z, z, jnp.sqrt(g_pp)], axis=-1)
    return et, er, eh, ep


def lnrbasis_matrix(m: AbstractMetric, x):
    return jnp.stack(lnrbasis(m, x), axis=-1)


def lnrframe_matrix(m: AbstractMetric, x):
    return jnp.stack(lnrframe(m, x), axis=-1)


def lowerindices(m: AbstractMetric, x, v):
    return jnp.einsum(
        "...ij,...j->...i", m.metric(x), v, precision=jax.lax.Precision.HIGHEST
    )


def raiseindices(m: AbstractMetric, x, v):
    return jnp.einsum(
        "...ij,...j->...i", m.inverse_metric(x), v, precision=jax.lax.Precision.HIGHEST
    )
