"""Image planes: polar and cartesian pixelizations of the (α, β) plane.

Reference: `src/image-planes/planes.jl` — `PolarPlane` (Nr×Nθ with grid-typed
radial spacing, per-cell area ∝ r²) and `CartesianPlane`.
"""

from __future__ import annotations

import jax.numpy as jnp

from gradus_tpu.camera.grids import LinearGrid

__all__ = ["PolarPlane", "CartesianPlane"]


class PolarPlane:
    def __init__(
        self,
        grid=None,
        Nr: int = 400,
        Ntheta: int = 100,
        r_min: float = 1.0,
        r_max: float = 250.0,
        theta_min: float = 0.0,
        theta_max: float = 2 * jnp.pi,
    ):
        self.grid = grid or LinearGrid()
        self.Nr = Nr
        self.Ntheta = Ntheta
        self.r_min = r_min
        self.r_max = r_max
        self.theta_min = theta_min
        self.theta_max = theta_max

    def trajectory_count(self):
        return self.Nr * self.Ntheta

    def impact_parameters(self):
        """(α, β) flattened arrays (reference `image_plane`, planes.jl:100-110)."""
        rs = self.grid(self.r_min, self.r_max, self.Nr)
        dtheta = (self.theta_max - self.theta_min) / self.Ntheta
        thetas = jnp.linspace(self.theta_min, self.theta_max - dtheta, self.Ntheta)
        alpha = rs[:, None] * jnp.cos(thetas)[None, :]
        beta = rs[:, None] * jnp.sin(thetas)[None, :]
        return alpha.ravel(), beta.ravel()

    def unnormalized_areas(self):
        rs = self.grid(self.r_min, self.r_max, self.Nr)
        A = rs**2
        return jnp.repeat(A[:, None], self.Ntheta, axis=1).ravel()


class CartesianPlane:
    def __init__(
        self,
        Nx: int = 150,
        Ny: int = 150,
        x_min: float = -10.0,
        x_max: float = 10.0,
        y_min: float = -10.0,
        y_max: float = 10.0,
    ):
        self.Nx = Nx
        self.Ny = Ny
        self.x_min, self.x_max = x_min, x_max
        self.y_min, self.y_max = y_min, y_max

    def trajectory_count(self):
        return self.Nx * self.Ny

    def impact_parameters(self):
        xs = jnp.linspace(self.x_min, self.x_max, self.Nx)
        ys = jnp.linspace(self.y_min, self.y_max, self.Ny)
        alpha = jnp.broadcast_to(xs[:, None], (self.Nx, self.Ny))
        beta = jnp.broadcast_to(ys[None, :], (self.Nx, self.Ny))
        return alpha.ravel(), beta.ravel()

    def unnormalized_areas(self):
        return jnp.ones(self.Nx * self.Ny)
