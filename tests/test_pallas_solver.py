"""Pallas tile-resident integrator vs the XLA while_loop solver.

Runs in interpret mode on the CPU test backend; the same kernel compiles to
Mosaic on TPU (validated on hardware: statuses identical, endpoints to f32
roundoff, see bench history).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gradus_tpu.metrics import KerrMetric
from gradus_tpu.geometry import ThinDisc
from gradus_tpu.integrate import trace_geodesics, StatusCodes
from gradus_tpu.integrate.pallas_solver import PallasTracer
from gradus_tpu.camera.impact import map_impact_parameters


@pytest.fixture(scope="module")
def kerr_disc_setup():
    m = KerrMetric(M=1.0, a=0.998)
    d = ThinDisc(inner_r=0.0, outer_r=50.0)
    x_obs = jnp.asarray([0.0, 1000.0, np.deg2rad(75.0), 0.0])
    rng = np.random.default_rng(2)
    n = 96
    A = jnp.asarray(rng.uniform(-12, 12, n))
    B = jnp.asarray(rng.uniform(-12, 12, n))
    v = map_impact_parameters(m, x_obs, A, B)
    xs = jnp.broadcast_to(x_obs, v.shape)
    return m, d, xs, v


@pytest.mark.slow
def test_pallas_matches_xla_solver(kerr_disc_setup):
    m, d, xs, v = kerr_disc_setup
    gp_ref = trace_geodesics(m, xs, v, (0.0, 2200.0), geometry=d)
    pt = PallasTracer(m, geometry=d, interpret=True)
    gp_pal = pt(xs, v, (0.0, 2200.0))

    s_ref = np.asarray(gp_ref.status)
    s_pal = np.asarray(gp_pal.status)
    assert (s_ref == s_pal).all()
    # disc hits land on the same surface point to solver tolerance
    hit = s_ref == StatusCodes.IntersectedWithGeometry
    assert hit.sum() > 10
    assert np.allclose(
        np.asarray(gp_ref.x)[hit], np.asarray(gp_pal.x)[hit], atol=1e-5
    )
    assert np.allclose(
        np.asarray(gp_ref.lam_max)[hit], np.asarray(gp_pal.lam_max)[hit], atol=1e-5
    )
    # hits are on the equatorial plane within the annulus
    xh = np.asarray(gp_pal.x)[hit]
    assert np.allclose(xh[:, 2], np.pi / 2, atol=1e-5)


def test_pallas_no_geometry_chart_bounds(kerr_disc_setup):
    m, _, xs, v = kerr_disc_setup
    gp_ref = trace_geodesics(m, xs, v, (0.0, 2200.0))
    pt = PallasTracer(m, interpret=True)
    gp_pal = pt(xs, v, (0.0, 2200.0))
    assert (np.asarray(gp_ref.status) == np.asarray(gp_pal.status)).all()
    ok = np.asarray(gp_ref.status) != StatusCodes.WithinInnerBoundary
    assert np.allclose(
        np.asarray(gp_ref.x)[ok, 1], np.asarray(gp_pal.x)[ok, 1], rtol=1e-6
    )


@pytest.mark.slow
def test_pallas_segmented_matches_single_pass(kerr_disc_setup):
    """Tail-segmented execution (capped pass 1 + sorted resume pass 2) must be
    bit-compatible with the single-pass kernel: the resume path restores the
    exact integrator carry, so statuses and endpoints are identical."""
    m, d, xs, v = kerr_disc_setup
    pt1 = PallasTracer(m, geometry=d, interpret=True)
    gp1 = pt1(xs, v, (0.0, 2200.0))
    # tiny cap + small bucket forces several rays through the resume path
    pt2 = PallasTracer(
        m,
        geometry=d,
        interpret=True,
        segment_iters=48,
        tail_bucket=128,
        tail_tile_rows=8,
    )
    gp2 = pt2(xs, v, (0.0, 2200.0))
    assert (np.asarray(gp1.status) == np.asarray(gp2.status)).all()
    np.testing.assert_allclose(
        np.asarray(gp1.x), np.asarray(gp2.x), rtol=0, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(gp1.lam_max), np.asarray(gp2.lam_max), rtol=0, atol=0
    )


@pytest.mark.slow
def test_pallas_unfinished_counter(kerr_disc_setup):
    """An undersized tail bucket must be *detected*, not silent: rays that
    never resumed stay NoStatus and are counted in aux["unfinished"]."""
    import jax

    m, d, xs, v = kerr_disc_setup
    pt = PallasTracer(
        m, geometry=d, interpret=True, segment_iters=24, tail_bucket=8
    )
    y0 = pt._constrain(xs, v)
    _, aux = jax.jit(lambda y: pt.trace(y, (0.0, 2200.0)))(y0)
    assert int(aux["unfinished"]) > 0

    ok = PallasTracer(m, geometry=d, interpret=True)
    _, aux_ok = jax.jit(lambda y: ok.trace(y, (0.0, 2200.0)))(y0)
    assert int(aux_ok["unfinished"]) == 0
