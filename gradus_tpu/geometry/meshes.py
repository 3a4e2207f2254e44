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

    # --- mesh-file ingestion ----------------------------------------------
    # The reference loads meshes through GeometryBasics / FileIO
    # (`src/geometry/meshes.jl:4-30` consumes a GeometryBasics.Mesh built by
    # `load(file)`). Here the two ubiquitous interchange formats are parsed
    # directly into the (T, 3, 3) triangle soup — no external deps.

    @staticmethod
    def from_file(path):
        """Load a mesh by extension: .obj (ASCII) or .stl (ASCII/binary)."""
        p = str(path).lower()
        if p.endswith(".obj"):
            return MeshAccretionGeometry.from_obj(path)
        if p.endswith(".stl"):
            return MeshAccretionGeometry.from_stl(path)
        raise ValueError(f"unsupported mesh format: {path} (use .obj or .stl)")

    @staticmethod
    def from_obj(path):
        """Wavefront OBJ: `v x y z` vertices + `f i j k ...` faces (1-based,
        `i/uv/n` attribute syntax accepted); polygons are fan-triangulated."""
        verts = []
        faces = []
        with open(path) as fh:
            for line in fh:
                parts = line.split()
                if not parts:
                    continue
                if parts[0] == "v":
                    verts.append([float(c) for c in parts[1:4]])
                elif parts[0] == "f":
                    idx = [int(tok.split("/")[0]) for tok in parts[1:]]
                    idx = [i - 1 if i > 0 else len(verts) + i for i in idx]
                    for k in range(1, len(idx) - 1):
                        faces.append([idx[0], idx[k], idx[k + 1]])
        if not faces:
            raise ValueError(f"no faces found in OBJ file {path}")
        V = np.asarray(verts, dtype=float)
        F = np.asarray(faces, dtype=int)
        return MeshAccretionGeometry.from_triangles(V[F])

    @staticmethod
    def from_stl(path):
        """STL, either flavor. Binary: 80-byte header, uint32 count, then
        50-byte records (normal + 3 vertices + attribute). ASCII: `vertex`
        lines grouped in threes."""
        with open(path, "rb") as fh:
            raw = fh.read()
        is_ascii = raw[:6].strip().lower().startswith(b"solid")
        if is_ascii:
            # some binary files also start with "solid": verify by length
            n = np.frombuffer(raw[80:84], np.uint32)[0] if len(raw) >= 84 else -1
            if len(raw) == 84 + 50 * int(n):
                is_ascii = False
        if is_ascii:
            vs = []
            for line in raw.decode("ascii", errors="ignore").splitlines():
                parts = line.split()
                if parts and parts[0] == "vertex":
                    vs.append([float(c) for c in parts[1:4]])
            if len(vs) < 3:
                raise ValueError(f"no triangles found in STL file {path}")
            tri = np.asarray(vs, dtype=float)[: 3 * (len(vs) // 3)].reshape(
                -1, 3, 3
            )
        else:
            n = int(np.frombuffer(raw[80:84], np.uint32)[0])
            rec = np.frombuffer(raw[84 : 84 + 50 * n], dtype=np.uint8)
            rec = rec.reshape(n, 50)
            floats = rec[:, :48].copy().view(np.float32).reshape(n, 4, 3)
            tri = floats[:, 1:4].astype(float)  # drop the normal row
        return MeshAccretionGeometry.from_triangles(tri)
