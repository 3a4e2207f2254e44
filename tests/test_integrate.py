"""Integrator correctness: RK order, conservation, capture/escape physics,
disc intersection accuracy, and differentiability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradus_tpu.geodesics import constrain_all, propernorm
from gradus_tpu.integrate import StatusCodes, trace_geodesics
from gradus_tpu.integrate.tsit5 import tsit5_step
from gradus_tpu.metrics import KerrMetric, SchwarzschildMetric, SphericalMetric
from gradus_tpu.geometry import ThinDisc
from gradus_tpu.utils.linalg import spherical_to_cartesian


def test_tsit5_convergence_order():
    """Fixed-step integration of y' = -y from 0 to 1 converges at 5th order."""

    def f(y):
        return -y

    errors = []
    for n in (8, 16, 32):
        dt = jnp.full((1,), 1.0 / n)
        y = jnp.ones((1, 1))
        for _ in range(n):
            y, _, _, _ = tsit5_step(f, y, dt)
        errors.append(abs(float(y[0, 0]) - np.exp(-1.0)))
    order1 = np.log2(errors[0] / errors[1])
    order2 = np.log2(errors[1] / errors[2])
    assert order1 > 4.5 and order2 > 4.5


def test_energy_angular_momentum_conservation():
    """E = -g_tν v^ν and Lz = g_φν v^ν conserved along a Kerr photon orbit
    at the solver tolerance."""
    m = KerrMetric(M=1.0, a=0.998)
    x = jnp.array([0.0, 100.0, np.pi / 2 - 0.4, 0.0])
    v = jnp.array([0.0, -1.0, 0.01, 2e-4])
    v = constrain_all(m, x, v, mu=0.0)
    gp = trace_geodesics(m, x, v, (0.0, 500.0), constrain=False)

    def E(x, v):
        g = m.metric(x)
        return -(g[0, 0] * v[0] + g[0, 3] * v[3])

    def Lz(x, v):
        g = m.metric(x)
        return g[3, 3] * v[3] + g[0, 3] * v[0]

    np.testing.assert_allclose(float(E(gp.x, gp.v)), float(E(x, v)), rtol=1e-7)
    np.testing.assert_allclose(float(Lz(gp.x, gp.v)), float(Lz(x, v)), rtol=1e-7)
    # null norm preserved
    nrm = float(propernorm(m.metric(gp.x), gp.v))
    assert abs(nrm) < 1e-7


def test_schwarzschild_capture_escape():
    """Critical impact parameter b_c = 3√3 M ≈ 5.196: below → capture
    (WithinInnerBoundary), above → escape past the observer radius."""
    m = SchwarzschildMetric(M=1.0)
    r0 = 1000.0
    for b, expect_capture in ((5.0, True), (5.4, False)):
        # photon aimed at impact parameter b: L/E = b for equatorial photon
        x = jnp.array([0.0, r0, np.pi / 2, 0.0])
        # construct velocity: v_phi from L = b·E with E from flat-space norm
        f = 1 - 2 / r0
        vphi = b / r0**2 / f  # L = r² vφ, E ≈ f v^t; choose v^t = 1/f → L = b
        v = jnp.array([0.0, -1.0, 0.0, vphi])
        v = constrain_all(m, x, v, mu=0.0)
        gp = trace_geodesics(m, x, v, (0.0, 4000.0))
        if expect_capture:
            assert int(gp.status) == int(StatusCodes.WithinInnerBoundary)
        else:
            # escapes: either still going at λmax or left the domain
            assert int(gp.status) in (
                int(StatusCodes.NoStatus),
                int(StatusCodes.OutOfDomain),
            )
            assert float(gp.x[1]) > 100.0


def test_flat_space_straight_line():
    """In spherical Minkowski the ray travels in a straight line: check the
    cartesian endpoint against the analytic line."""
    m = SphericalMetric()
    x = jnp.array([0.0, 50.0, np.pi / 3, 0.3])
    v = jnp.array([0.0, -1.0, 0.02, 0.01])
    v = constrain_all(m, x, v, mu=0.0)
    lam_end = 20.0
    gp = trace_geodesics(m, x, v, (0.0, lam_end), chart_outer=1e5)
    assert int(gp.status) == int(StatusCodes.NoStatus)
    # the affine parameter IS proper distance/time here; direction from v:
    p0 = np.asarray(spherical_to_cartesian(x))
    p1 = np.asarray(spherical_to_cartesian(gp.x))
    # velocity in cartesian at start
    r, th, ph = 50.0, np.pi / 3, 0.3
    dr, dth, dph = -1.0, 0.02, 0.01
    J = np.array(
        [
            [
                np.sin(th) * np.cos(ph),
                r * np.cos(th) * np.cos(ph),
                -r * np.sin(th) * np.sin(ph),
            ],
            [
                np.sin(th) * np.sin(ph),
                r * np.cos(th) * np.sin(ph),
                r * np.sin(th) * np.cos(ph),
            ],
            [np.cos(th), -r * np.sin(th), 0.0],
        ]
    )
    vcart = J @ np.array([dr, dth, dph])
    expected = p0 + lam_end * vcart
    np.testing.assert_allclose(p1, expected, rtol=1e-7, atol=1e-7)


def test_thin_disc_intersection_flat_space():
    """Flat space, ray from above the plane moving down: the hit position is
    exactly where the straight line crosses z = 0 (within the gtol band)."""
    m = SphericalMetric()
    # start on the z-axis-ish, move mostly in -z
    x = jnp.array([0.0, 30.0, 0.3, 0.0])
    v = jnp.array([0.0, -0.8, 0.05, 0.0])
    v = constrain_all(m, x, v, mu=0.0)
    d = ThinDisc(inner_r=0.0, outer_r=100.0)
    gp = trace_geodesics(m, x, v, (0.0, 200.0), geometry=d, gtol=1e-6, chart_outer=1e4)
    assert int(gp.status) == int(StatusCodes.IntersectedWithGeometry)
    # z at hit ≈ 0 (within gtol band ~ 1e-6·r)
    z = float(gp.x[1] * jnp.cos(gp.x[2]))
    assert abs(z) < 1e-4
    # straight-line crossing: z(λ) = r cosθ; solve numerically from cartesian
    p0 = np.asarray(spherical_to_cartesian(x))
    r, th = 30.0, 0.3
    J_z = np.array([np.cos(th), -r * np.sin(th)])
    vz = J_z @ np.array([-0.8, 0.05])
    lam_cross = -p0[2] / vz
    np.testing.assert_allclose(float(gp.lam_max), lam_cross, rtol=1e-4)


def test_kerr_disc_hit_batch():
    """A batch of rays from an observer toward a Kerr disc: some hit, some are
    captured, some miss. Statuses must be consistent with impact parameter."""
    m = KerrMetric(M=1.0, a=0.9)
    d = ThinDisc(inner_r=0.0, outer_r=50.0)
    r0 = 1000.0
    x = jnp.tile(jnp.array([0.0, r0, np.radians(75.0), 0.0]), (5, 1))
    # aim with varying β (vertical impact parameter)
    from gradus_tpu.camera.impact import map_impact_parameters

    alphas = jnp.array([0.0, 3.0, -6.0, 10.0, 30.0])
    betas = jnp.array([2.0, 2.0, 2.0, 2.0, 2.0])
    v = map_impact_parameters(m, x[0], alphas, betas)
    gp = trace_geodesics(m, x, v, (0.0, 2 * r0), geometry=d)
    statuses = np.asarray(gp.status)
    # rays pointed at the disc plane with small |α| should intersect or capture
    assert (statuses != int(StatusCodes.NoStatus)).any()
    # the wide ray (α=30) must intersect the disc (ρ ≈ 30 < 50)
    assert statuses[4] == int(StatusCodes.IntersectedWithGeometry)
    if statuses[4] == int(StatusCodes.IntersectedWithGeometry):
        rho = float(gp.x[4, 1] * jnp.sin(gp.x[4, 2]))
        assert 10.0 < rho < 50.0


@pytest.mark.slow
def test_trace_differentiable_forward():
    """jax.jacfwd through the full trace (the reference pushes ForwardDiff
    duals through the ODE solve the same way)."""
    m = SchwarzschildMetric(M=1.0)
    d = ThinDisc(inner_r=0.0, outer_r=100.0)

    def hit_radius(beta):
        x = jnp.array([0.0, 100.0, np.radians(60.0), 0.0])
        from gradus_tpu.camera.impact import map_impact_parameters

        v = map_impact_parameters(m, x, jnp.asarray(0.0), beta)
        gp = trace_geodesics(m, x, v, (0.0, 300.0), geometry=d)
        return gp.x[1]

    beta0 = 10.0
    r0 = float(hit_radius(jnp.asarray(beta0)))
    assert r0 > 6.0  # sanity: hits the disc outside the ISCO region
    grad = float(jax.jacfwd(hit_radius)(jnp.asarray(beta0)))
    eps = 1e-3
    fd = (float(hit_radius(jnp.asarray(beta0 + eps))) - float(hit_radius(jnp.asarray(beta0 - eps)))) / (
        2 * eps
    )
    np.testing.assert_allclose(grad, fd, rtol=2e-3)
