"""Triangle-mesh accretion geometry with the Jiménez-Segura-Feito
segment-triangle intersection test.

Reference: `src/geometry/meshes.jl` + `src/geometry/intersections.jl:58-101`
(JSF algorithm, Computational Geometry 43 (2010) 474-492). The per-step
line-element test becomes a vectorized (rays × segments × triangles) predicate.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gradus_tpu.utils.linalg import spherical_to_cartesian

__all__ = ["jsf_segment_triangle", "MeshAccretionGeometry"]


def jsf_segment_triangle(q1, q2, v1, v2, v3, eps: float = 1e-8):
    """Branchless JSF: does segment q1→q2 cross triangle (v1, v2, v3)?

    One-sided (front-facing only), matching the reference
    (intersections.jl:58-101). Shapes broadcast: q (..., 3), v (..., 3)."""
    A = q1 - v3
    B = v1 - v3
    C = v2 - v3
    W1 = jnp.cross(B, C)
    w = jnp.sum(A * W1, axis=-1)
    D = q2 - v3
    s = jnp.sum(D * W1, axis=-1)

    W2p = jnp.cross(A, D)
    t_p = jnp.sum(W2p * C, axis=-1)
    u_p = -jnp.sum(W2p * B, axis=-1)
    hit_pos = (
        (w > eps)
        & (s <= eps)
        & (t_p >= -eps)
        & (u_p >= -eps)
        & (w >= s + t_p + u_p)
    )

    W2z = jnp.cross(D, A)
    t_z = jnp.sum(W2z * C, axis=-1)
    u_z = -jnp.sum(W2z * B, axis=-1)
    hit_zero = (
        (jnp.abs(w) <= eps)
        & (s < -eps)
        & (t_z <= eps)
        & (u_z <= eps)
        & (-s <= t_z + u_z)
    )
    return hit_pos | hit_zero


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MeshAccretionGeometry:
    """Triangle soup (T, 3, 3) in cartesian coordinates with a bounding box.

    Used through the solver's segment-hit event mode: rays terminate at the
    end of any step whose path crosses a triangle (reference semantics — the
    DiscreteCallback terminates at step end, meshes.jl:66-77)."""

    triangles: Any  # (T, 3, 3)
    bbox_min: Any  # (3,)
    bbox_max: Any  # (3,)
    proximity2: float = dataclasses.field(default=9.0, metadata=dict(static=True))

    segment_based = True
    optically_thin = True

    @staticmethod
    def from_triangles(triangles):
        tri = jnp.asarray(triangles, dtype=float)
        flat = np.asarray(tri).reshape(-1, 3)
        return MeshAccretionGeometry(
            triangles=tri,
            bbox_min=jnp.asarray(flat.min(axis=0)),
            bbox_max=jnp.asarray(flat.max(axis=0)),
        )

    def inner_radius(self):
        return 0.0

    def segment_hit(self, xa4, xb4):
        """(..., 4) BL positions → bool: does the cartesian chord cross the
        mesh? Includes the reference's bounding-box and triangle-proximity
        prefilters (meshes.jl:52-77)."""
        q1 = spherical_to_cartesian(xa4)
        q2 = spherical_to_cartesian(xb4)
        inbox = jnp.all((q2 > self.bbox_min) & (q2 < self.bbox_max), axis=-1)
        v1 = self.triangles[:, 0]
        v2 = self.triangles[:, 1]
        v3 = self.triangles[:, 2]
        d2 = jnp.sum((v1 - q2[..., None, :]) ** 2, axis=-1)
        near = d2 < self.proximity2
        hits = jsf_segment_triangle(
            q1[..., None, :], q2[..., None, :], v1, v2, v3
        )
        return inbox & jnp.any(hits & near, axis=-1)
