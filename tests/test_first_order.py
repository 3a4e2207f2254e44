"""First-order (Carter/Mino) Kerr tracer vs the second-order AD tracer."""

import jax.numpy as jnp
import numpy as np

import gradus_tpu as gt
from gradus_tpu.camera.impact import map_impact_parameters
from gradus_tpu.metrics.kerr_first_order import (
    KerrSpacetimeFirstOrder,
    carter_constants,
    trace_geodesics_first_order,
)
from gradus_tpu.integrate import StatusCodes, trace_geodesics


def test_carter_constants_conserved():
    """E, L, Q computed at the endpoint of an AD-traced geodesic match the
    initial values."""
    m = KerrSpacetimeFirstOrder(M=1.0, a=0.9)
    x = jnp.array([0.0, 100.0, 1.2, 0.0])
    v = map_impact_parameters(m, x, jnp.asarray(5.0), jnp.asarray(3.0))
    gp = trace_geodesics(m, x, v, (0.0, 150.0))
    E0, L0, Q0 = carter_constants(m, gp.x_init, gp.v_init)
    E1, L1, Q1 = carter_constants(m, gp.x, gp.v)
    np.testing.assert_allclose(float(E1), float(E0), rtol=1e-7)
    np.testing.assert_allclose(float(L1), float(L0), rtol=1e-7)
    np.testing.assert_allclose(float(Q1), float(Q0), rtol=1e-5, atol=1e-8)


def test_first_order_matches_ad_disc_hits():
    """FO and AD tracers must land disc hits at the same radii."""
    m_fo = KerrSpacetimeFirstOrder(M=1.0, a=0.998)
    m_ad = gt.KerrMetric(M=1.0, a=0.998)
    d = gt.ThinDisc(0.0, 50.0)
    x = jnp.array([0.0, 1000.0, np.deg2rad(75.0), 0.0])
    alphas = jnp.array([6.0, -8.0, 15.0, 30.0])
    betas = jnp.array([2.0, 2.0, 2.0, 2.0])
    v = map_impact_parameters(m_ad, x, alphas, betas)
    xs = jnp.broadcast_to(x, v.shape)
    gp_ad = trace_geodesics(m_ad, xs, v, (0.0, 2000.0), geometry=d)
    gp_fo = trace_geodesics_first_order(m_fo, xs, v, (0.0, 2000.0), geometry=d)
    st_ad = np.asarray(gp_ad.status)
    st_fo = np.asarray(gp_fo.status)
    np.testing.assert_array_equal(st_ad, st_fo)
    hit = st_ad == int(StatusCodes.IntersectedWithGeometry)
    assert hit.sum() >= 3
    r_ad = np.asarray(gp_ad.x[:, 1])[hit]
    r_fo = np.asarray(gp_fo.x[:, 1])[hit]
    np.testing.assert_allclose(r_fo, r_ad, rtol=5e-3)  # Mino-form invariant drift near the hole
    # arrival coordinate times agree
    t_ad = np.asarray(gp_ad.x[:, 0])[hit]
    t_fo = np.asarray(gp_fo.x[:, 0])[hit]
    np.testing.assert_allclose(t_fo, t_ad, rtol=5e-3)
