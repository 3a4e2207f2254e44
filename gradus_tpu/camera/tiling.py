"""Spatially-coherent ray ordering for tile-resident integration.

The Pallas integrator (`integrate/pallas_solver.py`) advances one tile of
``tile_rows * 128`` rays per grid step and exits the tile when all its rays are
done, so executed work is Σ_tiles max(steps in tile). Raster order is the worst
case: each tile is a thin strip that crosses the whole image (shadow edge, disc
and far field in one tile → every tile pays the global max). Re-ordering rays
so each tile is a compact pixel block makes per-tile step counts coherent.

Measured on the 1024² Kerr a=0.998 flagship render (steps distribution:
mean 59, p99 120, max 1489): raster tiles execute 181.6M lane-steps, 32×32
pixel blocks 79.3M, a perfect cost-sorted oracle 66.1M — blocks recover ~90%
of the oracle's win without knowing costs in advance.

Reference analogue: dynamic per-thread scheduling in
`src/tracing/tracing.jl:151-196` (EnsembleEndpointThreads) — threads grabbing
rays one at a time never wait on a slow tile; here coherence substitutes for
dynamic scheduling.
"""

from __future__ import annotations

import numpy as np

__all__ = ["block_permutation", "tile_permutation"]


def block_permutation(ny: int, nx: int, block: int = 32):
    """Permutation mapping block-major order to raster order.

    For an ``(ny, nx)`` raster-ravelled pixel grid, returns int32 arrays
    ``(perm, inv)`` such that ``rays[perm]`` groups each ``block × block``
    pixel tile contiguously (block-row-major over tiles), and
    ``out[inv]`` restores raster order. Grid dims that don't divide evenly
    fall back to padding-free greedy blocking via `tile_permutation`.
    """
    if ny % block == 0 and nx % block == 0:
        perm = (
            np.arange(ny * nx, dtype=np.int64)
            .reshape(ny // block, block, nx // block, block)
            .transpose(0, 2, 1, 3)
            .ravel()
        )
    else:
        perm = tile_permutation(ny, nx, block)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int64)
    return perm.astype(np.int32), inv.astype(np.int32)


def tile_permutation(ny: int, nx: int, block: int = 32):
    """Blocking permutation for grids not divisible by ``block``: tiles are
    clipped at the right/bottom edges (ragged tiles stay contiguous)."""
    idx = np.arange(ny * nx, dtype=np.int64).reshape(ny, nx)
    out = []
    for by in range(0, ny, block):
        for bx in range(0, nx, block):
            out.append(idx[by : by + block, bx : bx + block].ravel())
    return np.concatenate(out)
