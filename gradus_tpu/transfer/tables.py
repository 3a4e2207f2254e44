"""Precomputed transfer-function tables over (spin, inclination) and the
fittable line-profile model.

Reference: `CunninghamTransferGrid`/`CunninghamTransferTable`
(`src/transfer-functions/types.jl:14-118`), `make_transfer_function_table`
(cunningham-transfer-functions.jl:500-530) and the SpectralFitting adapter
`GradusSpectralModels.LineProfile`
(`lib/GradusSpectralModels/src/GradusSpectralModels.jl:5-67`).

The table stacks `TransferBranchGrid`s on an (a, θ_obs) lattice; queries
interpolate every grid quantity bilinearly, giving a differentiable fittable
relativistic line model: flux(E; K, a, θ_obs, r_in, r_out, lineE).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gradus_tpu.transfer.cunningham import TransferBranchGrid, transferfunctions
from gradus_tpu.transfer.integration import integrate_lineprofile

__all__ = [
    "CunninghamTransferTable",
    "make_transfer_function_table",
    "LineProfileModel",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CunninghamTransferTable:
    """(a, θ) lattice of transfer grids; callable at (a, θ) → interpolated
    TransferBranchGrid."""

    a_grid: Any  # (Na,)
    theta_grid: Any  # (Nt,) degrees
    # stacked grid quantities: leading axes (Na, Nt)
    radii: Any  # (Na, Nt, nr)
    gmin: Any
    gmax: Any
    gstar: Any  # (Ng,)
    lower_f: Any  # (Na, Nt, nr, Ng)
    upper_f: Any
    lower_t: Any
    upper_t: Any

    def __repr__(self):
        # reference show method parity (transfer-functions/types.jl:164-174)
        try:
            import numpy as _np

            ag = _np.asarray(self.a_grid)
            tg = _np.asarray(self.theta_grid)
            return (
                "CunninghamTransferTable\n"
                f"  . a grid      : {ag.shape[0]} in ({ag.min():.4g}, {ag.max():.4g})\n"
                f"  . θ grid (°)  : {tg.shape[0]} in ({tg.min():.4g}, {tg.max():.4g})\n"
                f"  . radii × g✶  : {self.radii.shape[-1]} × {self.gstar.shape[0]}"
            )
        except Exception:
            return object.__repr__(self)

    def __call__(self, a, theta) -> TransferBranchGrid:
        a = jnp.asarray(a)
        theta = jnp.asarray(theta)
        ia = jnp.clip(
            jnp.searchsorted(self.a_grid, a, side="right") - 1,
            0,
            self.a_grid.shape[0] - 2,
        )
        it = jnp.clip(
            jnp.searchsorted(self.theta_grid, theta, side="right") - 1,
            0,
            self.theta_grid.shape[0] - 2,
        )
        wa = jnp.clip(
            (a - self.a_grid[ia])
            / jnp.maximum(self.a_grid[ia + 1] - self.a_grid[ia], 1e-12),
            0.0,
            1.0,
        )
        wt = jnp.clip(
            (theta - self.theta_grid[it])
            / jnp.maximum(self.theta_grid[it + 1] - self.theta_grid[it], 1e-12),
            0.0,
            1.0,
        )

        def bilerp(q):
            return (
                q[ia, it] * (1 - wa) * (1 - wt)
                + q[ia + 1, it] * wa * (1 - wt)
                + q[ia, it + 1] * (1 - wa) * wt
                + q[ia + 1, it + 1] * wa * wt
            )

        return TransferBranchGrid(
            radii=bilerp(self.radii),
            gmin=bilerp(self.gmin),
            gmax=bilerp(self.gmax),
            gstar=self.gstar,
            lower_f=bilerp(self.lower_f),
            upper_f=bilerp(self.upper_f),
            lower_t=bilerp(self.lower_t),
            upper_t=bilerp(self.upper_t),
        )


def make_transfer_function_table(
    metric_cls,
    d,
    a_range,
    theta_range,
    *,
    r_max: float = 500.0,
    n_radii: int = 150,
    r_obs: float = 10000.0,
    verbose: bool = False,
    progress=None,
    **kwargs,
) -> CunninghamTransferTable:
    """Precompute grids over the (a, θ_obs[deg]) lattice
    (reference `make_transfer_function_table`)."""
    from gradus_tpu.camera.grids import InverseGrid
    from gradus_tpu.orbits.special_radii import isco as _isco

    grids = []
    for a in np.asarray(a_range):
        row = []
        for th in np.asarray(theta_range):
            m = metric_cls(M=1.0, a=float(a))
            x = jnp.array([0.0, r_obs, np.deg2rad(float(th)), 0.0])
            radii = InverseGrid()(float(_isco(m)) + 1e-2, r_max, n_radii)
            g = transferfunctions(m, x, d, radii=radii, **kwargs)
            if verbose:
                print(f"table: a={a}, theta={th} done")
            if progress is not None:
                progress(
                    dict(
                        done=len(grids) * len(np.asarray(theta_range)) + len(row) + 1,
                        total=len(np.asarray(a_range)) * len(np.asarray(theta_range)),
                        a=float(a),
                        theta=float(th),
                    )
                )
            row.append(g)
        grids.append(row)

    def stack(attr):
        return jnp.stack(
            [jnp.stack([getattr(g, attr) for g in row]) for row in grids]
        )

    return CunninghamTransferTable(
        a_grid=jnp.asarray(np.asarray(a_range, dtype=float)),
        theta_grid=jnp.asarray(np.asarray(theta_range, dtype=float)),
        radii=stack("radii"),
        gmin=stack("gmin"),
        gmax=stack("gmax"),
        gstar=grids[0][0].gstar,
        lower_f=stack("lower_f"),
        upper_f=stack("upper_f"),
        lower_t=stack("lower_t"),
        upper_t=stack("upper_t"),
    )


def _powerlaw3(r):
    return r**-3.0


@dataclasses.dataclass
class LineProfileModel:
    """Fittable additive table model: relativistic Fe-Kα line
    (reference `GradusSpectralModels.LineProfile`). Parameters follow the
    reference: K (norm), a, θ_obs (deg), inner_r, outer_r, lineE (keV).

    Calling with an energy-bin domain returns the (differentiable) model flux
    — usable directly in gradient-based spectral fitting."""

    table: CunninghamTransferTable
    emissivity: Any = dataclasses.field(default=None)
    K: float = 1.0
    a: float = 0.998
    theta_obs: float = 45.0
    inner_r: float = 1.0
    outer_r: float = 100.0
    lineE: float = 6.4

    def __call__(self, energies, **overrides):
        params = {**dataclasses.asdict(self), **overrides}
        eps = self.emissivity or _powerlaw3
        grid = self.table(params["a"], params["theta_obs"])
        rmin = jnp.maximum(params["inner_r"], grid.radii[0])
        rmax = jnp.maximum(params["outer_r"], rmin)
        flux = integrate_lineprofile(
            eps,
            grid,
            jnp.asarray(energies),
            rmin=rmin,
            rmax=rmax,
            g_scale=params["lineE"],
        )
        return params["K"] * flux
