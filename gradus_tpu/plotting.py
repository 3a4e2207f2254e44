"""Plotting and path-extraction helpers.

The reference ships Plots.jl recipes (`src/plotting-recipes.jl`: 3D/polar
geodesic paths, event-horizon shading). Here the same artefacts are produced
as plain arrays, with optional matplotlib rendering when available.
"""

from __future__ import annotations

import numpy as np

from gradus_tpu.utils.linalg import spherical_to_cartesian

__all__ = [
    "paths_to_cartesian",
    "event_horizon_outline",
    "plot_paths",
    "plot_image",
]


def paths_to_cartesian(traj, traj_lam, n_steps):
    """(N, n_save, S) trajectories → list of (n_i, 3) cartesian paths."""
    traj = np.asarray(traj)
    n_steps = np.atleast_1d(np.asarray(n_steps))
    if traj.ndim == 2:
        traj = traj[None]
    out = []
    for i in range(traj.shape[0]):
        n = int(n_steps[i])
        out.append(np.asarray(spherical_to_cartesian(traj[i, :n, 0:4])))
    return out


def event_horizon_outline(m, resolution: int = 180):
    """(x, z) outline of the event horizon for poloidal plots
    (reference plotting-recipes.jl horizon shading)."""
    from gradus_tpu.orbits.special_radii import event_horizon

    rs, thetas = event_horizon(m, resolution=resolution)
    rs = np.asarray(rs)
    thetas = np.asarray(thetas)
    return rs * np.sin(thetas), rs * np.cos(thetas)


def plot_paths(m, traj, traj_lam, n_steps, ax=None, plane: str = "xy"):
    """Plot geodesic paths (projected) with the horizon disc; requires
    matplotlib. Returns the axis."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots()
    paths = paths_to_cartesian(traj, traj_lam, n_steps)
    ij = {"xy": (0, 1), "xz": (0, 2), "yz": (1, 2)}[plane]
    for p in paths:
        ax.plot(p[:, ij[0]], p[:, ij[1]], lw=0.8)
    rh = float(np.asarray(m.inner_radius()))
    circle = plt.Circle((0, 0), rh, color="k")
    ax.add_patch(circle)
    ax.set_aspect("equal")
    return ax


def plot_image(alphas, betas, img, ax=None, **kwargs):
    """Render an (α, β) image (redshift / shadow); requires matplotlib."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots()
    im = ax.pcolormesh(np.asarray(alphas), np.asarray(betas), np.asarray(img), **kwargs)
    ax.set_xlabel(r"$\alpha$")
    ax.set_ylabel(r"$\beta$")
    ax.set_aspect("equal")
    return ax, im
