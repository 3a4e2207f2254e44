"""Line-profile and lag-transfer integration over transfer-function branches.

Reference: `src/transfer-functions/integration.jl`. The flux in energy bin
[g_lo, g_hi] from an annulus at rₑ is

    ∫ S(g) dg,   S(g) = I(rₑ, g) · f(g✶) · g / √(g✶(1−g✶)),

with I(r, g) = g² for line profiles, integrated with fixed-order
Gauss-Legendre plus analytic √-edge handling within h of the branch extrema
(`integrate_bin`, :161-200), and an annulus weight
Δrₑ·rₑ·ε(rₑ)·π/(gmax−gmin) (:356).

Vectorized: all (fine radius, energy bin, quadrature node) combinations
evaluate simultaneously; the radial accumulation is one matmul-like reduction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gradus_tpu.camera.grids import InverseGrid, GeometricGrid
from gradus_tpu.transfer.cunningham import TransferBranchGrid, g_to_gstar, gstar_to_g
from gradus_tpu.utils.quadrature import gauss_legendre

__all__ = [
    "integrate_lineprofile",
    "integrate_lagtransfer",
    "integrate_lagtransfer_timedep",
]


def _branch_value(grid_rows, gstar_axis, gstar_q):
    """Interpolate branch rows (nf, Ng) at query g✶ (nf, ...)."""
    Ng = gstar_axis.shape[0]
    idx = jnp.clip(
        jnp.searchsorted(gstar_axis, gstar_q, side="right") - 1, 0, Ng - 2
    )
    x0 = gstar_axis[idx]
    x1 = gstar_axis[idx + 1]
    w = jnp.clip((gstar_q - x0) / (x1 - x0), 0.0, 1.0)
    v0 = jnp.take_along_axis(grid_rows, idx, axis=-1)
    v1 = jnp.take_along_axis(grid_rows, idx + 1, axis=-1)
    return v0 * (1 - w) + v1 * w


def _make_S_both(branches, gstar_axis, gmin, gmax):
    """S(g) per fine radius: (nf, K) g-values → (nf, K) integrand values,
    summing both branches (reference `_both_branches`, integration.jl:124-146)."""

    def S(gvals):
        gstar = (gvals - gmin[:, None]) / (gmax - gmin)[:, None]
        # dtype-aware interior clip: a fixed 1-1e-12 upper bound rounds to
        # exactly 1.0 in float32, sending 1/√(g✶(1−g✶)) to ∞ at the edge
        # nodes (the round-3 f32 NaN-bin failure)
        eps = jnp.finfo(gvals.dtype).eps
        lo = jnp.maximum(jnp.asarray(1e-12, gvals.dtype), 4 * eps)
        gstar_c = jnp.clip(gstar, lo, 1.0 - lo)
        fl = _branch_value(branches["lower_f"], gstar_axis, gstar_c)
        fu = _branch_value(branches["upper_f"], gstar_axis, gstar_c)
        f = jnp.nan_to_num(fl) + jnp.nan_to_num(fu)
        return gvals**3 * f / jnp.sqrt(gstar_c * (1.0 - gstar_c))

    return S


def _integrate_bins(S, g_grid, gmin, gmax, h, quad):
    """Vectorized `integrate_bin` over (nf radii, nb bins).

    Returns (nf, nb) bin integrals (without the annulus weight)."""
    Xq, Wq = quad
    glo_raw = g_grid[None, :-1]
    ghi_raw = g_grid[None, 1:]
    gmin_ = gmin[:, None]
    gmax_ = gmax[:, None]
    glo = jnp.clip(glo_raw, gmin_, gmax_)
    ghi = jnp.clip(ghi_raw, gmin_, gmax_)
    empty = glo >= ghi

    span = gmax_ - gmin_
    gstar_lo = (glo_raw - gmin_) / span
    gstar_hi = (ghi_raw - gmin_) / span

    # --- √-edge corrections ---------------------------------------------
    def edge(lim_g, lim_gstar):
        gh = lim_gstar * span + gmin_
        Sgh = S(gh)
        return Sgh * jnp.abs(jnp.sqrt(gh) - jnp.sqrt(lim_g)) * float(np.sqrt(h))

    lo_edge = gstar_lo < h
    hi_edge = gstar_hi > 1.0 - h
    edge_lo_lim = jnp.minimum(gstar_hi, h)
    edge_hi_lim = jnp.maximum(gstar_lo, 1.0 - h)
    E_lo = jnp.where(lo_edge, edge(glo, edge_lo_lim), 0.0)
    E_hi = jnp.where(hi_edge, edge(ghi, edge_hi_lim), 0.0)

    glo_eff = jnp.where(lo_edge, h * span + gmin_, glo)
    ghi_eff = jnp.where(hi_edge, (1.0 - h) * span + gmin_, ghi)
    has_interior = ghi_eff > glo_eff

    # --- Gauss-Legendre interior ------------------------------------------
    q = (ghi_eff - glo_eff) / 2.0
    mid = (ghi_eff + glo_eff) / 2.0
    total = jnp.zeros_like(glo)
    for xi, wi in zip(Xq, Wq):
        total = total + wi * S(mid + q * xi)
    interior = jnp.where(has_interior, total * q, 0.0)

    return jnp.where(empty, 0.0, E_lo + E_hi + interior)


def _normalize_flux(flux, g_grid):
    """flux[i] /= (g[i]+g[i+1]); flux /= Σ (reference `_normalize!`,
    utils.jl:121-132)."""
    gbar = g_grid[:-1] + g_grid[1:]
    flux = flux / gbar
    total = jnp.sum(flux)
    return jnp.where(total > 0, flux / total, flux)


@partial(
    jax.jit,
    static_argnames=(
        "emissivity",
        "h",
        "n_radii",
        "quadrature_points",
        "normalize",
    ),
)
def integrate_lineprofile(
    emissivity,
    tfs: TransferBranchGrid,
    g_grid,
    *,
    h: float = 2e-8,
    n_radii: int = 1000,
    quadrature_points: int = 7,
    rmin=None,
    rmax=None,
    g_scale: float = 1.0,
    normalize: bool = True,
):
    """Integrate a line profile over the transfer-function table.

    emissivity: callable ε(r) (reference default r⁻³) or array broadcastable
    over radii. Returns flux with len(g_grid) entries (last = 0, as in the
    reference's output layout)."""
    g_grid = jnp.asarray(g_grid)
    rmin = tfs.inner_radius() if rmin is None else rmin
    rmax = tfs.outer_radius() if rmax is None else rmax

    # dtype-aware edge width: the f64 default h = 2e-8 is below float32's
    # g✶ resolution, degenerating the analytic √-edge handling
    h = max(h, 8.0 * float(jnp.finfo(g_grid.dtype).eps))

    r_fine = InverseGrid()(rmin, rmax, n_radii)
    dr = jnp.diff(r_fine, prepend=rmin - (r_fine[1] - rmin))
    br = tfs.at_radius(r_fine)
    gmin, gmax = br["gmin"], br["gmax"]

    eps = emissivity(r_fine) if callable(emissivity) else jnp.asarray(emissivity)
    weight = dr * r_fine * eps * jnp.pi / (gmax - gmin)

    S = _make_S_both(br, tfs.gstar, gmin, gmax)
    quad = gauss_legendre(quadrature_points)
    bins = _integrate_bins(S, g_grid / g_scale, gmin, gmax, h, quad)  # (nf, nb)
    flux_bins = jnp.einsum(
        "f,fb->b", weight, bins, precision=jax.lax.Precision.HIGHEST
    )
    if normalize:
        flux_bins = _normalize_flux(flux_bins, g_grid)
    return jnp.concatenate([flux_bins, jnp.zeros((1,), flux_bins.dtype)])


def integrate_lagtransfer(
    profile,
    tfs: TransferBranchGrid,
    g_grid,
    t_grid,
    *,
    h: float = 2e-8,
    n_radii: int = 1000,
    quadrature_points: int = 7,
    rmin=None,
    rmax=None,
    g_scale: float = 1.0,
    t0: float = 0.0,
):
    """2D (g, t) flux: branch fluxes scatter-added into arrival-time bins
    (reference `_integrate_transfer_problem!` matrix variant,
    integration.jl:374-453). ``profile`` must provide emissivity_at(r) and
    coordtime_at(r) (a RadialDiscProfile) — t0 is the continuum time offset."""
    g_grid = jnp.asarray(g_grid)
    t_grid = jnp.asarray(t_grid)
    rmin = tfs.inner_radius() if rmin is None else rmin
    rmax = tfs.outer_radius() if rmax is None else rmax

    r_fine = GeometricGrid()(rmin, rmax, n_radii)
    dr = jnp.diff(r_fine, prepend=rmin - (r_fine[1] - rmin))
    br = tfs.at_radius(r_fine)
    gmin, gmax = br["gmin"], br["gmax"]

    eps = profile.emissivity_at(r_fine)
    t_source_disc = profile.coordtime_at(r_fine) - t0
    weight = dr * r_fine * eps * jnp.pi / (gmax - gmin)

    quad = gauss_legendre(quadrature_points)

    def branch_S(which):
        def S(gvals):
            gstar = (gvals - gmin[:, None]) / (gmax - gmin)[:, None]
            gstar_c = jnp.clip(gstar, 1e-12, 1.0 - 1e-12)
            f = _branch_value(br[which], tfs.gstar, gstar_c)
            return gvals**3 * jnp.nan_to_num(f) / jnp.sqrt(
                gstar_c * (1.0 - gstar_c)
            )

        return S

    k_lower = _integrate_bins(branch_S("lower_f"), g_grid / g_scale, gmin, gmax, h, quad)
    k_upper = _integrate_bins(branch_S("upper_f"), g_grid / g_scale, gmin, gmax, h, quad)

    # arrival time per (radius, bin): branch time averaged over the bin edges
    # (reference `_time_bins`, integration.jl:103-112)
    span_ = (gmax - gmin)[:, None]
    gstar_e0 = jnp.clip((g_grid[None, :-1] / g_scale - gmin[:, None]) / span_, 1e-6, 1 - 1e-6)
    gstar_e1 = jnp.clip((g_grid[None, 1:] / g_scale - gmin[:, None]) / span_, 1e-6, 1 - 1e-6)
    t_lower = 0.5 * (
        _branch_value(br["lower_t"], tfs.gstar, gstar_e0)
        + _branch_value(br["lower_t"], tfs.gstar, gstar_e1)
    ) + t_source_disc[:, None]
    t_upper = 0.5 * (
        _branch_value(br["upper_t"], tfs.gstar, gstar_e0)
        + _branch_value(br["upper_t"], tfs.gstar, gstar_e1)
    ) + t_source_disc[:, None]

    nb = g_grid.shape[0] - 1
    nt = t_grid.shape[0]

    def scatter(k, t_arr):
        ti = jnp.searchsorted(t_grid, t_arr)  # (nf, nb)
        valid = ti < nt
        ti = jnp.clip(ti, 0, nt - 1)
        contrib = jnp.where(valid, k * weight[:, None], 0.0)
        flat_idx = (jnp.arange(nb)[None, :] * nt + ti).ravel()
        out = jnp.zeros((nb * nt,), k.dtype).at[flat_idx].add(contrib.ravel())
        return out.reshape(nb, nt)

    out = scatter(k_lower, t_lower) + scatter(k_upper, t_upper)

    # normalize (reference matrix `_normalize!`, utils.jl:134-147). NB: the
    # reference's final `flux = flux ./ maximum(sum(flux, dims=2))` REBINDS a
    # local instead of mutating, so it never reaches the returned array — the
    # effective normalization is total = 1 only. Mirrored faithfully (the
    # reverberation goldens depend on it through the 1+Re(𝔉ψ) phase).
    gbar = (g_grid[:-1] + g_grid[1:])[:, None]
    out = out / gbar
    total = jnp.sum(out)
    out = jnp.where(total > 0, out / total, out)
    # pad to len(g_grid) rows like the reference output layout
    return jnp.concatenate([out, jnp.zeros((1, nt), out.dtype)], axis=0)


def integrate_lagtransfer_timedep(
    profile,
    tfs: TransferBranchGrid,
    g_grid,
    t_grid,
    *,
    h: float = 2e-8,
    n_radii: int = 400,
    n_time: int = 100,
    quadrature_points: int = 7,
    rmin=None,
    rmax=None,
    g_scale: float = 1.0,
    t0: float = 0.0,
):
    """2D (g, t) flux for a TIME-DEPENDENT emissivity profile (ring / disc
    corona): per annulus the branch flux is spread over the source-to-disc
    light curve ε(t | rₑ) instead of a single delay (reference
    `_integrate_transfer_problem!` for RingCoronaProfile/DiscCoronaProfile,
    ring.jl:857-950, N_t_steps=100).

    `profile` must provide `time_limits_at(r)` and
    `time_emissivity_curve(r, tq)` (a TimeDependentRadialDiscProfile,
    RingCoronaProfile, or DiscCoronaProfile). The time axis is a `lax.scan`
    so peak memory stays at one (n_radii, n_bins) panel per step."""
    g_grid = jnp.asarray(g_grid)
    t_grid = jnp.asarray(t_grid)
    rmin = tfs.inner_radius() if rmin is None else rmin
    rmax = tfs.outer_radius() if rmax is None else rmax

    r_fine = GeometricGrid()(rmin, rmax, n_radii)
    dr = jnp.diff(r_fine, prepend=rmin - (r_fine[1] - rmin))
    br = tfs.at_radius(r_fine)
    gmin, gmax = br["gmin"], br["gmax"]
    weight = dr * r_fine * jnp.pi / (gmax - gmin)

    quad = gauss_legendre(quadrature_points)

    def branch_S(which):
        def S(gvals):
            gstar = (gvals - gmin[:, None]) / (gmax - gmin)[:, None]
            gstar_c = jnp.clip(gstar, 1e-12, 1.0 - 1e-12)
            f = _branch_value(br[which], tfs.gstar, gstar_c)
            return gvals**3 * jnp.nan_to_num(f) / jnp.sqrt(
                gstar_c * (1.0 - gstar_c)
            )

        return S

    k_lower = _integrate_bins(branch_S("lower_f"), g_grid / g_scale, gmin, gmax, h, quad)
    k_upper = _integrate_bins(branch_S("upper_f"), g_grid / g_scale, gmin, gmax, h, quad)

    span_ = (gmax - gmin)[:, None]
    gstar_e0 = jnp.clip((g_grid[None, :-1] / g_scale - gmin[:, None]) / span_, 1e-6, 1 - 1e-6)
    gstar_e1 = jnp.clip((g_grid[None, 1:] / g_scale - gmin[:, None]) / span_, 1e-6, 1 - 1e-6)
    t_lower = 0.5 * (
        _branch_value(br["lower_t"], tfs.gstar, gstar_e0)
        + _branch_value(br["lower_t"], tfs.gstar, gstar_e1)
    )
    t_upper = 0.5 * (
        _branch_value(br["upper_t"], tfs.gstar, gstar_e0)
        + _branch_value(br["upper_t"], tfs.gstar, gstar_e1)
    )

    # light curve ε(t | rₑ) sampled on n_time points per annulus
    tmin, tmax = jax.vmap(profile.time_limits_at)(r_fine)  # (nf,)
    frac = jnp.linspace(0.0, 1.0, n_time)
    tq = tmin[:, None] + frac[None, :] * (tmax - tmin)[:, None]  # (nf, nt_src)
    em = jax.vmap(profile.time_emissivity_curve)(r_fine, tq)  # (nf, nt_src)
    dt_src = (tmax - tmin) / n_time  # (nf,)

    nb = g_grid.shape[0] - 1
    nt = t_grid.shape[0]

    def scatter_step(out, inputs):
        tq_k, em_k = inputs  # (nf,), (nf,)
        amp = (weight * em_k * dt_src)[:, None]  # (nf, 1)
        for k_br, t_br in ((k_lower, t_lower), (k_upper, t_upper)):
            t_arr = t_br + tq_k[:, None] - t0  # (nf, nb)
            ti = jnp.searchsorted(t_grid, t_arr)
            valid = ti < nt
            ti = jnp.clip(ti, 0, nt - 1)
            contrib = jnp.where(valid, k_br * amp, 0.0)
            flat_idx = (jnp.arange(nb)[None, :] * nt + ti).ravel()
            out = out.at[flat_idx].add(contrib.ravel())
        return out, None

    out0 = jnp.zeros((nb * nt,), k_lower.dtype)
    out, _ = jax.lax.scan(scatter_step, out0, (tq.T, em.T))
    out = out.reshape(nb, nt)

    gbar = (g_grid[:-1] + g_grid[1:])[:, None]
    out = out / gbar
    total = jnp.sum(out)
    out = jnp.where(total > 0, out / total, out)
    return jnp.concatenate([out, jnp.zeros((1, nt), out.dtype)], axis=0)
