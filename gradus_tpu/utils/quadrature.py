"""Gauss-Legendre quadrature nodes/weights (reference uses QuadGK's
`gauss(T, n)` for the line-profile bin integration, `src/transfer-functions/
integration.jl:20-63`). Computed once on host with numpy."""

from __future__ import annotations

import numpy as np

__all__ = ["gauss_legendre"]


def gauss_legendre(n: int, dtype=np.float64):
    """Nodes and weights on [-1, 1]."""
    x, w = np.polynomial.legendre.leggauss(n)
    return x.astype(dtype), w.astype(dtype)
