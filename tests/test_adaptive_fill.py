"""Adaptive grid: scalable disparity, shadow-edge refinement, and the
intersect-aware plane fill (reference adaptive-grid.jl / adaptive-plane.jl)."""

import time

import jax.numpy as jnp
import numpy as np

import gradus_tpu as gt
from gradus_tpu.camera.adaptive import AdaptiveGrid2D, fill_sky_values
from gradus_tpu.camera.impact import map_impact_parameters
from gradus_tpu.integrate.status import StatusCodes


def _step_values(cx, cy):
    """Synthetic field with a sharp circular edge (a fake shadow)."""
    r = np.hypot(cx, cy)
    vals = np.where(r < 4.0, np.nan, 1.0 / np.maximum(r, 1e-6))
    return vals


def test_disparity_kdtree_matches_bruteforce():
    grid = AdaptiveGrid2D((-8, 8), (-8, 8), n0=12)
    grid._v_old = None
    grid.set_values(_step_values(grid.cx, grid.cy))
    fast = grid.neighbour_disparity()
    brute = grid._neighbour_disparity_brute()
    np.testing.assert_allclose(fast, brute)


def test_disparity_scales():
    """1e4+ cells in well under a second (the old loop was O(n²) minutes)."""
    grid = AdaptiveGrid2D((-8, 8), (-8, 8), n0=110)  # 12100 cells
    grid._v_old = None
    grid.set_values(_step_values(grid.cx, grid.cy))
    t0 = time.perf_counter()
    disp = grid.neighbour_disparity()
    dt = time.perf_counter() - t0
    assert disp.shape == grid.cx.shape
    assert dt < 2.0


def test_refinement_concentrates_at_edge():
    """Refined (deep) cells cluster at the synthetic shadow edge r=4."""
    grid = gt.adaptive_render(
        None,
        None,
        lambda cx, cy: _step_values(cx, cy),
        alpha_lims=(-8, 8),
        beta_lims=(-8, 8),
        n0=12,
        rounds=3,
        max_depth=3,
        threshold=0.05,
    )
    deep = grid.depth >= 2
    assert deep.sum() > 50
    r_deep = np.hypot(grid.cx[deep], grid.cy[deep])
    # nearly all deep cells hug the discontinuity
    assert (np.abs(r_deep - 4.0) < 1.5).mean() > 0.9


def test_fill_sky_values_reconstruction():
    """Rasterized image reproduces the field and respects the NaN boundary."""
    grid = gt.adaptive_render(
        None,
        None,
        lambda cx, cy: _step_values(cx, cy),
        alpha_lims=(-8, 8),
        beta_lims=(-8, 8),
        n0=12,
        rounds=2,
        max_depth=2,
        threshold=0.05,
    )
    xs, ys, img = fill_sky_values(grid, 96, 96)
    assert img.shape == (96, 96)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    R = np.hypot(X, Y)
    inside = R < 3.4
    outside = (R > 4.8) & (R < 7.5)
    # NaN (shadow) pixels stay NaN; outside matches 1/r to raster resolution
    assert np.isnan(img[inside]).mean() > 0.9
    ok = np.isfinite(img[outside])
    assert ok.mean() > 0.98
    rel = np.abs(img[outside][ok] - 1.0 / R[outside][ok]) * R[outside][ok]
    assert np.median(rel) < 0.05


def test_adaptive_shadow_render_real_trace():
    """End-to-end: adaptive refinement around a real Schwarzschild shadow
    edge (critical impact parameter 3√3 ≈ 5.196)."""
    m = gt.SchwarzschildMetric(M=1.0)
    x = jnp.array([0.0, 200.0, np.pi / 2, 0.0])

    def evaluate(al, be):
        al = jnp.asarray(al)
        be = jnp.asarray(be)
        v = map_impact_parameters(m, x, al, be)
        xs = jnp.broadcast_to(x, v.shape)
        gp = gt.trace_geodesics(m, xs, v, (0.0, 500.0), chart_outer=250.0)
        captured = gp.status == StatusCodes.WithinInnerBoundary
        # shadow mask: NaN inside, 1 outside — only the edge carries disparity
        return np.asarray(jnp.where(captured, jnp.nan, 1.0))

    grid = gt.adaptive_render(
        m, x, evaluate, alpha_lims=(-9.0, 9.0), beta_lims=(-9.0, 9.0),
        n0=10, rounds=2, max_depth=2, threshold=5.0,
    )
    deep = grid.depth >= 1
    assert deep.sum() > 20
    b_deep = np.hypot(grid.cx[deep], grid.cy[deep])
    # refinement hugs the critical curve
    assert (np.abs(b_deep - 3.0 * np.sqrt(3.0)) < 2.0).mean() > 0.8
