"""Adaptive refinement, dense trajectory saving, path extraction."""

import jax.numpy as jnp
import numpy as np

import gradus_tpu as gt
from gradus_tpu.camera.adaptive import adaptive_render
from gradus_tpu.camera.impact import map_impact_parameters
from gradus_tpu.integrate.tracing import trace_geodesics_dense
from gradus_tpu.plotting import paths_to_cartesian, event_horizon_outline


def test_dense_trajectory_matches_endpoint():
    m = gt.SchwarzschildMetric(M=1.0)
    x = jnp.array([0.0, 100.0, np.pi / 2, 0.0])
    v = map_impact_parameters(m, x, jnp.asarray(7.0), jnp.asarray(1.0))
    gp, traj, traj_lam, n = trace_geodesics_dense(m, x, v, (0.0, 300.0), n_save=256)
    n = int(n)
    assert 10 < n <= 256
    # trajectory ends at the endpoint
    np.testing.assert_allclose(
        np.asarray(traj[n - 1, 0:4]), np.asarray(gp.x), rtol=1e-10
    )
    # λ monotonically increasing over the saved prefix
    lam = np.asarray(traj_lam[:n])
    assert np.all(np.diff(lam) > 0)
    # radius varies smoothly; starts at observer
    assert np.isclose(float(traj[0, 1]), 100.0)
    paths = paths_to_cartesian(traj, traj_lam, n)
    assert paths[0].shape == (n, 3)


def test_event_horizon_outline():
    m = gt.KerrMetric(M=1.0, a=0.9)
    xo, zo = event_horizon_outline(m, resolution=64)
    r = np.hypot(xo, zo)
    np.testing.assert_allclose(r, 1 + np.sqrt(1 - 0.81), rtol=1e-6)


def test_adaptive_render_refines_shadow_edge():
    """Refinement should concentrate cells at the shadow boundary, using far
    fewer rays than the dense grid of equal resolution."""
    m = gt.SchwarzschildMetric(M=1.0)
    x = jnp.array([0.0, 100.0, np.pi / 2, 0.0])
    shadow_pf = gt.ConstPointFunctions.shadow()

    def evaluate(alphas, betas):
        a = jnp.asarray(alphas)
        b = jnp.asarray(betas)
        v = map_impact_parameters(m, x, a, b)
        xs = jnp.broadcast_to(x, v.shape)
        gps = gt.trace_geodesics(m, xs, v, (0.0, 300.0))
        return np.asarray(shadow_pf(m, gps, 300.0))

    grid = adaptive_render(
        m, x, evaluate, alpha_lims=(-8, 8), beta_lims=(-8, 8), n0=8, rounds=2,
        max_depth=3, threshold=5.0,
    )
    # cells refined (smaller than initial) cluster near the critical radius
    fine = grid.w < (16.0 / 8) * 0.9
    assert fine.sum() > 20
    r_fine = np.hypot(grid.cx[fine], grid.cy[fine])
    # shadow boundary at b_c = 3√3 ≈ 5.196
    assert abs(np.median(r_fine) - 5.196) < 1.5
