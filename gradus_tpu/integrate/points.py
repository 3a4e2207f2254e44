"""GeodesicPoint — struct-of-arrays endpoint record.

Reference: `GeodesicPoint{T,A}` in `src/solution-processing.jl:15-32` (status,
λ range, start/end position & velocity, aux payload) and `unpack_solution`
(`:86-112`).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax

__all__ = ["GeodesicPoint", "unpack_solution"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GeodesicPoint:
    status: Any  # (N,) int32 StatusCodes
    lam_min: Any  # (N,) start affine parameter
    lam_max: Any  # (N,) end affine parameter
    x_init: Any  # (N, 4)
    v_init: Any  # (N, 4)
    x: Any  # (N, 4) endpoint position
    v: Any  # (N, 4) endpoint velocity
    aux: Any = None  # (N, K) extra integrated state (e.g. radiative intensity)

    def __getitem__(self, idx):
        return jax.tree_util.tree_map(lambda a: a[idx] if a is not None else None, self)


def unpack_solution(result) -> GeodesicPoint:
    """Endpoint extraction from an `IntegrationResult`
    (reference `unpack_solution`, solution-processing.jl:86-112)."""
    y, y0 = result.y, result.y0
    aux = y[..., 8:] if y.shape[-1] > 8 else None
    return GeodesicPoint(
        status=result.status,
        lam_min=result.lam0,
        lam_max=result.lam,
        x_init=y0[..., 0:4],
        v_init=y0[..., 4:8],
        x=y[..., 0:4],
        v=y[..., 4:8],
        aux=aux,
    )
