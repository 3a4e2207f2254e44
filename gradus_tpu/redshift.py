"""Redshift point function: g = E_obs / E_disc via metric dot products, with
Keplerian disc velocity outside the ISCO and the exact plunging velocity
inside.

Reference: `src/redshift.jl` — the Cunningham (1975) analytic machinery for
Kerr and the generic dot-product path (`_redshift_dotproduct`, :204-220;
`interpolate_redshift`, :246-276). Here the closed-form plunging velocity
(`gradus_tpu.orbits.plunging`) replaces both the Cunningham special case and
the reference's numerically-interpolated plunge, so one code path serves every
static axis-symmetric metric.

Conventions mirrored from the reference:
- observer velocity v_obs = (1, 0, 0, 0), unnormalized (redshift.jl:208);
- the plunging radial velocity sign is flipped because photons are traced
  backwards from the observer (redshift.jl:258-262).
"""

from __future__ import annotations

import jax.numpy as jnp

from gradus_tpu.camera.pointfns import PointFunction
from gradus_tpu.geodesics.tetrads import dotproduct
from gradus_tpu.metrics.base import AbstractMetric
from gradus_tpu.orbits.circular import CircularOrbits
from gradus_tpu.orbits.plunging import interpolate_plunging_velocities
from gradus_tpu.utils.linalg import equatorial_project

__all__ = [
    "disc_velocity",
    "keplerian_velocity_projector",
    "redshift_pointfunction",
    "interpolate_redshift",
]


def keplerian_velocity_projector(m: AbstractMetric, contra_rotating=False):
    """x4 ↦ disc fluid 4-velocity: Keplerian circular orbit outside the ISCO,
    plunging (E, L frozen at ISCO) inside
    (reference `_keplerian_velocity_projector`, circular-orbits.jl:155-170)."""
    plunge = interpolate_plunging_velocities(m, contra_rotating=contra_rotating)
    r_isco = plunge.r_isco

    def project(x4):
        r = equatorial_project(x4)
        # evaluate both branches at guarded radii to keep them finite
        v_kep = CircularOrbits.fourvelocity(
            m, (jnp.maximum(r, r_isco), jnp.full_like(r, jnp.pi / 2)),
            contra_rotating=contra_rotating,
        )
        vp = plunge(jnp.minimum(r, r_isco))
        # backwards-tracing convention: reverse the radial component
        v_plunge = vp.at[..., 1].multiply(-1.0)
        return jnp.where((r < r_isco)[..., None], v_plunge, v_kep)

    return project


disc_velocity = keplerian_velocity_projector


def redshift_pointfunction(
    m: AbstractMetric, x_obs=None, contra_rotating=False, analytic: str = "auto"
):
    """PointFunction computing g = (g_obs·v_init·u_obs)/(g_disc·v·u_disc)
    (reference `_redshift_dotproduct`, redshift.jl:204-220).

    ``analytic``: "auto" dispatches Kerr (prograde) to the closed-form
    Cunningham machinery (`gradus_tpu.redshift_analytic`) — the reference's
    `redshift_function(::KerrMetric, gp)` fast path (redshift.jl:193-203),
    which skips both metric solves on the Keplerian branch; "never" forces
    the generic dot-product path (used by the cross-check test); "always"
    requires a KerrMetric and raises otherwise.
    """
    from gradus_tpu.metrics.kerr import KerrMetric

    is_kerr = type(m) is KerrMetric and not contra_rotating
    if analytic == "always" and not is_kerr:
        raise ValueError("analytic='always' requires a prograde KerrMetric")
    if analytic in ("auto", "always") and is_kerr:
        from gradus_tpu.redshift_analytic import analytic_redshift_pointfunction

        pf = analytic_redshift_pointfunction(m, x_obs)
        pf.is_analytic_kerr = True
        return pf

    project = keplerian_velocity_projector(m, contra_rotating=contra_rotating)

    def f(m_, gp, max_time, **kw):
        v_disc = project(gp.x)
        g_disc = m.metric(gp.x)
        g_obs = m.metric(gp.x_init)
        v_obs = jnp.zeros_like(gp.v_init).at[..., 0].set(1.0)
        E_disc = dotproduct(g_disc, gp.v, v_disc)
        E_obs = dotproduct(g_obs, gp.v_init, v_obs)
        return E_obs / E_disc

    pf = PointFunction(f)
    pf.is_analytic_kerr = False
    return pf


def interpolate_redshift(m: AbstractMetric, x_obs=None, **kwargs):
    """Reference-parity name (redshift.jl:246-276); the closed-form projector
    makes 'interpolation' exact."""
    return redshift_pointfunction(m, x_obs, **kwargs)
