"""Plotting-recipe array helpers + progress observability hooks.

Reference: `src/plotting-recipes.jl` (path extraction/windowing, horizon
surface, emissivity index) and the ProgressMeter plumbing
(`src/rendering/utility.jl:30-41`)."""

import jax.numpy as jnp
import numpy as np

import gradus_tpu as gt
from gradus_tpu.camera.impact import map_impact_parameters
from gradus_tpu.plotting import (
    extract_path,
    horizon_surface,
    horizon_circle,
    emissivity_index,
)


def test_horizon_shapes():
    m = gt.KerrMetric(M=1.0, a=0.9)
    x, y, z = horizon_surface(m, n_points=16)
    assert x.shape == (16, 16)
    R = float(np.asarray(m.inner_radius()))
    np.testing.assert_allclose(np.sqrt(x**2 + y**2 + z**2), R, rtol=1e-12)
    phi, r = horizon_circle(m, n_points=32, projection="polar")
    np.testing.assert_allclose(r, R)
    cx, cy = horizon_circle(m, n_points=32)
    np.testing.assert_allclose(np.hypot(cx, cy), R, rtol=1e-12)


def test_emissivity_index_powerlaw():
    """ε ∝ r^-3 → index ≈ 3 (reference Plot_Emissivity_Index semantics)."""

    class P:
        radii = np.geomspace(2.0, 50.0, 200)
        emissivity = radii**-3.0

    r, idx = emissivity_index(P())
    # forward-difference log-slope of a power law on a geometric grid has a
    # small systematic offset; 2% is ample
    np.testing.assert_allclose(idx, 3.0, rtol=4e-2)


def test_extract_path_window():
    """Terminated rays window at the endpoint; escaping at mid-flight
    (reference `_extract_path`, plotting-recipes.jl:3-30)."""
    from gradus_tpu.integrate.status import StatusCodes

    lam = np.linspace(0.0, 400.0, 81)
    traj = np.zeros((81, 8))
    traj[:, 1] = np.linspace(100.0, 3.0, 81)  # infalling r
    traj[:, 2] = np.pi / 2
    x, y, z = extract_path(
        traj, lam, 81, status=int(StatusCodes.WithinInnerBoundary),
        n_points=50, t_span=50.0,
    )
    assert x.shape == (50,)
    # windowed at the END of the path: small radii
    assert np.hypot(x, y).min() < 10.0
    x2, y2, z2 = extract_path(traj, lam, 81, status=None, n_points=50, t_span=50.0)
    # mid-flight window: radii near the middle of the trajectory
    assert 30.0 < np.hypot(x2, y2).mean() < 80.0


def test_tracer_progress_hook():
    """CompactedIntegrator reports per-segment progress (width, alive)."""
    m = gt.KerrMetric(M=1.0, a=0.5)
    events = []
    tracer = gt.Tracer(
        m,
        geometry=gt.ThinDisc(0.0, 20.0),
        min_bucket=64,
        segment_iters=64,
        progress=events.append,
    )
    x = jnp.array([0.0, 100.0, np.deg2rad(80.0), 0.0])
    al = jnp.linspace(-10.0, 10.0, 8) + 1e-3
    be = jnp.zeros(8) + 1e-3
    v = map_impact_parameters(m, x, al, be)
    xs = jnp.broadcast_to(x, v.shape)
    tracer(xs, v, (0.0, 300.0))
    assert len(events) >= 1
    e = events[0]
    assert e["total"] == 8 and e["width"] >= e["alive"] >= 0
    assert e["executed_iters"] > 0


def test_adaptive_render_progress_hook():
    from gradus_tpu.camera.adaptive import adaptive_render

    m = gt.KerrMetric(M=1.0, a=0.0)
    rounds = []

    def evaluate(ax, bx):
        return np.hypot(np.asarray(ax), np.asarray(bx))  # smooth: no refine

    adaptive_render(
        m, None, evaluate, n0=8, rounds=2, threshold=1e9,
        progress=lambda e: rounds.append(e),
    )
    assert rounds and rounds[0]["cells"] == 64 and rounds[0]["refining"] == 0
