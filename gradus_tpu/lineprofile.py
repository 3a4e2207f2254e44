"""Relativistic line profiles — the flagship product.

Reference: `src/line-profiles.jl`. Two methods:
- `TransferFunctionMethod` (default): Cunningham transfer functions +
  `integrate_lineprofile` (defaults: bins 0.1:1.5 ×180, minrₑ = isco+1e-2,
  maxrₑ = 50, numrₑ = 100, h = 2e-8);
- `BinningMethod`: trace a polar image plane, filter disc hits in
  [minrₑ, maxrₑ], flux = ε(r)·g³·area bucketed into g bins.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gradus_tpu.camera.grids import GeometricGrid
from gradus_tpu.camera.planes import PolarPlane
from gradus_tpu.camera.impact import map_impact_parameters
from gradus_tpu.integrate.status import StatusCodes
from gradus_tpu.integrate.tracing import trace_geodesics, domain_upper_hemisphere
from gradus_tpu.metrics.base import AbstractMetric
from gradus_tpu.transfer import transferfunctions, integrate_lineprofile
from gradus_tpu.utils.linalg import equatorial_project

__all__ = ["lineprofile", "TransferFunctionMethod", "BinningMethod", "binned_flux"]


class TransferFunctionMethod:
    pass


class BinningMethod:
    pass


def _default_emissivity(r):
    return r**-3.0


def lineprofile(
    m: AbstractMetric,
    x,
    d,
    *,
    bins=None,
    emissivity=None,
    profile=None,
    method=None,
    min_re=None,
    max_re: float = 50.0,
    num_re: int = 100,
    h: float = 2e-8,
    n_radii: int = 1000,
    lam_max=None,
    plane=None,
    redshift_pf=None,
    **kwargs,
):
    """Returns (bins, flux). Emissivity defaults to ε(r) = r⁻³."""
    from gradus_tpu.orbits.special_radii import isco as _isco

    x = jnp.asarray(x)
    if bins is None:
        bins = jnp.linspace(0.1, 1.5, 180, dtype=x.dtype)
    else:
        bins = jnp.asarray(bins, x.dtype)
    if emissivity is None:
        if profile is not None:
            emissivity = lambda r: profile.emissivity_at(r)
        else:
            emissivity = _default_emissivity
    if method is None:
        method = TransferFunctionMethod() if profile is None else BinningMethod()

    if isinstance(method, TransferFunctionMethod):
        tfs = transferfunctions(
            m, x, d, min_re=min_re, max_re=max_re, num_re=num_re, **kwargs
        )
        flux = integrate_lineprofile(emissivity, tfs, bins, h=h, n_radii=n_radii)
        return bins, flux

    # --- BinningMethod (reference line-profiles.jl:157-198) ---------------
    from gradus_tpu.redshift import redshift_pointfunction

    if min_re is None:
        min_re = _isco(m)
    if lam_max is None:
        lam_max = 2.0 * x[1]
    if plane is None:
        plane = PolarPlane(GeometricGrid(), Nr=450, Ntheta=1300, r_max=5 * max_re)
    if redshift_pf is None:
        redshift_pf = redshift_pointfunction(m, x)

    alpha, beta = plane.impact_parameters()
    areas = plane.unnormalized_areas()
    v = map_impact_parameters(m, x, alpha, beta)
    xs = jnp.broadcast_to(x, v.shape)
    gps = trace_geodesics(
        m,
        xs,
        v,
        (0.0, lam_max),
        geometry=d,
        terminate_fns=(domain_upper_hemisphere(),),
        **kwargs,
    )
    flux = binned_flux(
        m,
        gps,
        areas,
        emissivity,
        bins,
        min_re=min_re,
        max_re=max_re,
        lam_max=lam_max,
        redshift_pf=redshift_pf,
    )
    return bins, flux


def binned_flux(
    m,
    gps,
    areas,
    emissivity,
    bins,
    *,
    min_re,
    max_re,
    lam_max,
    redshift_pf,
    axis_name: str | None = None,
):
    """g-binned flux histogram f = ε(r)·g³·area over disc hits (reference
    line-profiles.jl:157-198). With `axis_name` (inside `shard_map` over a
    sharded ray axis) the histogram is `psum`-reduced over the mesh before
    normalization, so every device returns the identical global profile."""
    import jax

    r_em = equatorial_project(gps.x)
    hit = (
        (gps.status == StatusCodes.IntersectedWithGeometry)
        & (r_em >= min_re)
        & (r_em <= max_re)
    )
    g = redshift_pf(m, gps, lam_max)
    f = jnp.where(hit, emissivity(r_em) * g**3 * areas, 0.0)
    g_safe = jnp.where(hit, g, -1.0)
    idx = jnp.searchsorted(bins, g_safe) - 1
    valid = hit & (idx >= 0) & (idx < bins.shape[0] - 1)
    idx = jnp.clip(idx, 0, bins.shape[0] - 2)
    flux = jnp.zeros(bins.shape[0], f.dtype).at[idx].add(jnp.where(valid, f, 0.0))
    if axis_name is not None:
        flux = jax.lax.psum(flux, axis_name)
    total = jnp.sum(flux)
    return jnp.where(total > 0, flux / total, flux)
