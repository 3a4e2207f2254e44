"""Corona adaptive-sampling specialization: emissivity from a refined sky.

Reference: `/root/reference/src/corona/adaptive-sample.jl` —
`CoronaGridValues` payload (:1-28), dual-number emissivity Jacobian (:42-81),
`check_refine` on g/J disparity (:123-140), `bin_emissivity_grid!` /
`bin_redshift_grid!` / `bin_time_grid!` (:312-440), `step_block!` refinement
driver (:603+). 845 LoC of research-grade Julia; the TPU-native shape is the
same host-driven quadtree (`camera/adaptive.AdaptiveGrid2D`) with each
refinement round evaluated as ONE batched, jvp-augmented device trace.

Per sky cell (cosθ, φ) of the corona's local sky the tracer records

    t, r, φ_disc : hit coordinates on the disc (NaN when the ray missed)
    g            : source→disc energy ratio
    J            : |∂(r, φ_disc)/∂(θ, φ)| / sinθ  — the area magnification
                   from forward-mode tangents THROUGH the integrator (the
                   reference pushes ForwardDiff duals through a reusable
                   integrator; here two `jax.jvp` passes through the batched
                   while_loop)
    γ, √(g_rr g_φφ) : disc-frame Lorentz factor and proper-area element at
                   the hit radius (cached so binning is pure host numpy)

Refinement (reference `check_refine`): a cell splits while any neighbour
disagrees in g or J by more than ``rtol`` (2% default), unless both cells
missed the disc. The J disparity concentrates samples where the sky→disc map
is steep (photon ring, disc edges) — this is what makes extended-corona
emissivity affordable at production resolution.

Emissivity normalization: an isotropic unit-luminosity source emits
dN/dΩ = 1/4π in its rest frame, so

    ε(r) = Σ_cells ΔΩ/(4π) · I(g) / (A_proper(bin) · γ)

identical in form to the Monte-Carlo photon-count binning
(`emissivity.bin_corona_hits`, ε = N·I(g)/(A·γ)) with photon counts replaced
by exact solid-angle weights — the adaptive path needs no luck and ~10-30×
fewer rays for the same profile accuracy (tested in
tests/test_corona_adaptive.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from gradus_tpu.camera.adaptive import AdaptiveGrid2D
from gradus_tpu.corona.spectra import PowerLawSpectrum
from gradus_tpu.integrate.status import StatusCodes
from gradus_tpu.integrate.tracing import trace_geodesics, domain_upper_hemisphere
from gradus_tpu.metrics.base import AbstractMetric
from gradus_tpu.redshift import keplerian_velocity_projector
from gradus_tpu.utils.linalg import equatorial_project

__all__ = [
    "CoronaSkyTracer",
    "corona_adaptive_sky",
    "bin_emissivity_grid",
    "bin_redshift_grid",
    "bin_time_grid",
    "adaptive_emissivity_profile",
]

_FIELDS = ("t", "r", "phi", "g", "J", "gamma", "area_el", "dr_dth", "dr_dph")


class CoronaSkyTracer:
    """Batched (cosθ, φ) → CoronaGridValues tracer for one (metric, disc,
    corona) triple. Calls pad to power-of-two buckets so refinement rounds
    reuse compiled programs."""

    def __init__(
        self,
        m: AbstractMetric,
        d,
        model,
        *,
        lam_max: float = 10000.0,
        chart_outer: float = 12000.0,
        min_bucket: int = 512,
    ):
        self.min_bucket = min_bucket
        x_src, v_src = model.sample_position_velocity(m)
        disc_velocity = keplerian_velocity_projector(m)

        from gradus_tpu.corona.samplers import sky_angles_to_velocity
        from gradus_tpu.corona.emissivity import (
            energy_ratio,
            lorentz_factor,
        )

        @jax.jit
        def _eval(th, ph):
            def proj(args):
                th_, ph_ = args
                v = sky_angles_to_velocity(m, x_src, v_src, th_, ph_)
                xs = jnp.broadcast_to(x_src, v.shape)
                gp = trace_geodesics(
                    m,
                    xs,
                    v,
                    (0.0, lam_max),
                    geometry=d,
                    chart_outer=chart_outer,
                    terminate_fns=(domain_upper_hemisphere(),),
                    constrain=False,
                )
                r = equatorial_project(gp.x)
                v_disc = disc_velocity(gp.x)
                g = energy_ratio(m, gp, v_src, v_disc)
                gam = lorentz_factor(m, gp.x, v_disc)
                aux = (gp.x[..., 0], g, gam, gp.status)
                return (r, gp.x[..., 3]), aux

            ones = jnp.ones_like(th)
            zeros = jnp.zeros_like(th)
            # two forward-mode passes through the integrator give the per-ray
            # 2×2 Jacobian ∂(r, φ_disc)/∂(θ, φ) (adaptive-sample.jl:42-81)
            (r, phid), (dr_dth, dphi_dth), aux = jax.jvp(
                proj, ((th, ph),), ((ones, zeros),), has_aux=True
            )
            _, (dr_dph, dphi_dph), _ = jax.jvp(
                proj, ((th, ph),), ((zeros, ones),), has_aux=True
            )
            t, g, gam, status = aux
            det = jnp.abs(dr_dth * dphi_dph - dr_dph * dphi_dth)
            J = det / jnp.sin(th)
            hit = status == StatusCodes.IntersectedWithGeometry
            nan = jnp.nan
            comp = m.components(r, jnp.full_like(r, jnp.pi / 2))
            area_el = jnp.sqrt(comp[..., 1] * comp[..., 3])
            out = dict(
                t=jnp.where(hit, t, nan),
                r=jnp.where(hit, r, nan),
                phi=jnp.where(hit, phid, nan),
                g=jnp.where(hit, g, nan),
                J=jnp.where(hit, J, nan),
                gamma=jnp.where(hit, gam, nan),
                area_el=jnp.where(hit, area_el, nan),
                # radial footprint derivatives: each sky cell's image on the
                # disc spans ≈ |∂r/∂θ|Δθ + |∂r/∂φ|Δφ in radius — used to
                # smear deposited flux across radial bins (kills the
                # bin-quantization noise of point deposition)
                dr_dth=jnp.where(hit, jnp.abs(dr_dth), nan),
                dr_dph=jnp.where(hit, jnp.abs(dr_dph), nan),
            )
            return out, status

        self._eval = _eval
        self.n_traced = 0

    def __call__(self, cos_th, phi):
        cos_th = np.asarray(cos_th, dtype=np.float64)
        phi = np.asarray(phi, dtype=np.float64)
        n = cos_th.shape[0]
        self.n_traced += n
        bucket = self.min_bucket
        while bucket < n:
            bucket *= 2
        th = np.arccos(np.clip(cos_th, -1.0, 1.0))
        # pad with a benign interior angle; sliced away below
        th_p = np.full(bucket, np.pi / 2, dtype=np.float64)
        ph_p = np.zeros(bucket, dtype=np.float64)
        th_p[:n] = th
        ph_p[:n] = phi
        out, status = self._eval(jnp.asarray(th_p), jnp.asarray(ph_p))
        vals = {k: np.asarray(v)[:n] for k, v in out.items()}
        vals["status"] = np.asarray(status)[:n]
        return vals


def _merge(kept: dict, new: dict) -> dict:
    return {k: np.concatenate([kept[k], new[k]]) for k in kept}


def corona_adaptive_sky(
    m: AbstractMetric,
    d,
    model,
    *,
    n0: int = 24,
    rounds: int = 4,
    max_depth: int = 8,
    rtol: float = 0.02,
    max_refine: int | None = None,
    lam_max: float = 10000.0,
    chart_outer: float = 12000.0,
    tracer: CoronaSkyTracer | None = None,
    progress=None,
):
    """Adaptively sample the corona's local sky (reference `AdaptiveSky`
    specialization + `step_block!` driver, adaptive-sample.jl:140-178, 603+).

    Returns ``(grid, vals, n_traced)``: the leaf-cell quadtree over
    (cosθ ∈ (−1,1), φ ∈ (−π,π)), the per-cell CoronaGridValues dict, and the
    total number of rays traced (the adaptive budget)."""
    if tracer is None:
        tracer = CoronaSkyTracer(
            m, d, model, lam_max=lam_max, chart_outer=chart_outer
        )
    eps = 1e-6
    grid = AdaptiveGrid2D((-1.0 + eps, 1.0 - eps), (-np.pi, np.pi), n0)
    vals = tracer(grid.cx, grid.cy)

    for rnd in range(rounds):
        score = np.zeros(grid.cx.shape[0])
        # reference check_refine: too-coarse when g or J disagree with a
        # neighbour by > rtol (both-miss pairs never refine: NaN vs NaN
        # disparity is 0 in neighbour_disparity, NaN vs finite is +inf)
        for field in ("g", "J"):
            grid.values = vals[field]
            disp = grid.neighbour_disparity()
            scale = np.abs(vals[field])
            scale = np.where(np.isfinite(scale), scale, 0.0)
            rel = disp / np.maximum(rtol * np.maximum(scale, 1e-30), 1e-300)
            score = np.maximum(score, rel)
        refine = (score > 1.0) & (grid.depth < max_depth)
        if max_refine is not None and refine.sum() > max_refine:
            # budget cap (reference `limit` on step_block!): split exactly the
            # max_refine worst offenders (ties, e.g. the +inf hit/miss
            # boundary scores, broken arbitrarily — later rounds catch them)
            masked = np.where(refine, score, -np.inf)
            top = np.argpartition(-masked, max_refine - 1)[:max_refine]
            refine = np.zeros_like(refine)
            refine[top[masked[top] > 1.0]] = True
        if progress is not None:
            progress(
                dict(
                    round=rnd,
                    cells=int(grid.cx.shape[0]),
                    refining=int(refine.sum()),
                    traced=int(tracer.n_traced),
                )
            )
        if not refine.any():
            break
        keep = ~refine
        kept_vals = {k: v[keep] for k, v in vals.items()}
        n_new = grid.refine(refine)
        new_vals = tracer(grid.cx[-n_new:], grid.cy[-n_new:])
        vals = _merge(kept_vals, new_vals)

    grid.values = vals["g"]
    return grid, vals, tracer.n_traced


def _bin_weighted(grid, vals, r_bins, phi_bins, quantity):
    """ΔΩ-weighted scatter of a per-cell quantity into (r, φ) bins; returns
    (sum, solid_angle) grids (reference bin_*_grid! accumulate/normalize
    split, adaptive-sample.jl:312-440)."""
    r = vals["r"]
    hit = np.isfinite(r) & np.isfinite(quantity)
    d_omega = grid.w * grid.h  # grid is over (cosθ, φ): Δcosθ·Δφ = ΔΩ
    r_i = np.searchsorted(r_bins, r[hit], side="right") - 1
    p_i = np.searchsorted(phi_bins, np.mod(vals["phi"][hit], 2 * np.pi), side="right") - 1
    nr, np_ = len(r_bins) - 1, len(phi_bins) - 1
    ok = (r_i >= 0) & (r_i < nr) & (p_i >= 0) & (p_i < np_)
    flat = r_i[ok] * np_ + p_i[ok]
    w = d_omega[hit][ok]
    acc = np.bincount(flat, weights=w * quantity[hit][ok], minlength=nr * np_)
    sa = np.bincount(flat, weights=w, minlength=nr * np_)
    return acc.reshape(nr, np_), sa.reshape(nr, np_)


def bin_emissivity_grid(
    m: AbstractMetric,
    grid,
    vals,
    r_bins,
    phi_bins,
    spectrum=PowerLawSpectrum(2.0),
):
    """(r, φ) emissivity grid from the adaptive sky (reference
    `bin_emissivity_grid!`, adaptive-sample.jl:312-360).

    Flux DEPOSITION with AD-footprint smearing: each cell carries photon flux
    ΔΩ/(4π)·I(g)/γ which lands on a disc patch centred at (r, φ_disc) with
    radial extent ≈ |∂r/∂θ|Δθ + |∂r/∂φ|Δφ (the forward-mode derivatives
    through the integrator). Depositing the flux proportionally over the
    radial bins the footprint overlaps removes bin-quantization noise, and —
    unlike averaging pointwise 1/J estimates — correctly SUMS contributions
    where several sky branches illuminate the same radii (off-axis coronae).
    ε = deposited flux / proper bin area √(g_rr g_φφ)·Δr·Δφ."""
    r_bins = np.asarray(r_bins)
    phi_bins = np.asarray(phi_bins)
    r = vals["r"]
    hit = np.isfinite(r)
    spec = np.asarray(spectrum(jnp.asarray(np.nan_to_num(vals["g"], nan=1.0))))
    gam = np.where(np.isfinite(vals["gamma"]), vals["gamma"], 1.0)
    d_omega = grid.w * grid.h  # (cosθ, φ) grid: Δcosθ·Δφ = ΔΩ
    flux = d_omega * spec / (4.0 * np.pi * gam)

    # radial footprint half-span from the AD derivatives and the cell size
    sin_th = np.sqrt(np.maximum(1.0 - grid.cx**2, 1e-12))
    d_theta = grid.w / sin_th
    span = 0.5 * (
        np.nan_to_num(vals["dr_dth"]) * d_theta
        + np.nan_to_num(vals["dr_dph"]) * grid.h
    )
    span = np.clip(span, 1e-8, (r_bins[-1] - r_bins[0]))

    nr, np_ = len(r_bins) - 1, len(phi_bins) - 1
    p_i = np.searchsorted(
        phi_bins, np.mod(np.nan_to_num(vals["phi"]), 2 * np.pi), side="right"
    ) - 1
    sel = hit & (p_i >= 0) & (p_i < np_) & np.isfinite(flux)
    rc, sc, fc, pc = r[sel], span[sel], flux[sel], p_i[sel]
    lo, hi = rc - sc, rc + sc
    # (cells, bins) proportional overlap of [lo, hi] with each radial bin
    ov = np.clip(
        np.minimum(hi[:, None], r_bins[None, 1:])
        - np.maximum(lo[:, None], r_bins[None, :-1]),
        0.0,
        None,
    ) / (hi - lo)[:, None]
    acc = np.zeros((nr, np_))
    for j in range(np_):
        msk = pc == j
        if msk.any():
            acc[:, j] = (fc[msk][:, None] * ov[msk]).sum(axis=0)

    # solid-angle coverage map (diagnostic + valid-bin mask)
    _, sa = _bin_weighted(grid, vals, r_bins, phi_bins, np.ones_like(r))

    r_mid = 0.5 * (r_bins[:-1] + r_bins[1:])
    comp = np.asarray(
        m.components(jnp.asarray(r_mid), jnp.full(r_mid.shape, np.pi / 2))
    )
    area_el = np.sqrt(comp[..., 1] * comp[..., 3])
    area = (area_el * np.diff(r_bins))[:, None] * np.diff(phi_bins)[None, :]
    eps = acc / area
    return eps, sa


def bin_redshift_grid(grid, vals, r_bins, phi_bins):
    """ΔΩ-weighted mean redshift per (r, φ) bin (adaptive-sample.jl:363-405)."""
    acc, sa = _bin_weighted(grid, vals, np.asarray(r_bins), np.asarray(phi_bins), vals["g"])
    return np.where(sa > 0, acc / np.maximum(sa, 1e-300), np.nan), sa


def bin_time_grid(grid, vals, r_bins, phi_bins):
    """ΔΩ-weighted mean arrival time per (r, φ) bin (adaptive-sample.jl:408-450)."""
    acc, sa = _bin_weighted(grid, vals, np.asarray(r_bins), np.asarray(phi_bins), vals["t"])
    return np.where(sa > 0, acc / np.maximum(sa, 1e-300), np.nan), sa


def adaptive_emissivity_profile(
    m: AbstractMetric,
    d,
    model,
    spectrum=PowerLawSpectrum(2.0),
    *,
    n_bins: int = 60,
    r_lims=None,
    **sky_kwargs,
):
    """φ-integrated radial emissivity profile ε(r), t(r) from the adaptive
    sky — the drop-in counterpart of the dense Monte-Carlo
    `tracecorona_profile` at a fraction of the ray budget.

    Returns ``(RadialDiscProfile, n_traced)``."""
    from gradus_tpu.corona.profiles import RadialDiscProfile

    grid, vals, n_traced = corona_adaptive_sky(m, d, model, **sky_kwargs)
    r = vals["r"]
    hit = np.isfinite(r)
    if r_lims is None:
        r_lims = (np.nanmin(r), np.nanmax(r))
    r_bins = np.geomspace(max(r_lims[0], 1e-8), r_lims[1], n_bins + 1)
    phi_bins = np.asarray([0.0, 2 * np.pi])
    eps, sa = bin_emissivity_grid(m, grid, vals, r_bins, phi_bins, spectrum)
    tmean, _ = bin_time_grid(grid, vals, r_bins, phi_bins)
    # profile abscissae are the ΔΩ-weighted mean radii of each bin's cells
    # (bin mid-points would misattribute steep ε(r) by up to the bin width)
    racc, _ = _bin_weighted(grid, vals, r_bins, phi_bins, vals["r"])
    valid = sa[:, 0] > 0
    r_mid = 0.5 * (r_bins[:-1] + r_bins[1:])
    rbar = np.where(valid, racc[:, 0] / np.maximum(sa[:, 0], 1e-300), r_mid)
    radii = np.where(valid, rbar, np.inf)
    order = np.argsort(radii)
    prof = RadialDiscProfile(
        radii=jnp.asarray(radii[order]),
        eps=jnp.asarray(np.where(valid, eps[:, 0], 0.0)[order]),
        t=jnp.asarray(np.nan_to_num(tmean[:, 0], nan=0.0)[order]),
        n=jnp.asarray(int(valid.sum())),
    )
    return prof, n_traced
