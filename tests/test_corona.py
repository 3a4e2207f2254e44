"""Corona emissivity profiles: lamppost physics checks.

Reference parity: the emissivity of a lamppost-illuminated disc falls as
~r⁻³ at radii ≫ h (Dauser et al. 2013); arrival times grow with radius.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import gradus_tpu as gt


@pytest.fixture(scope="module")
def lamppost_profile():
    m = gt.KerrMetric(M=1.0, a=0.998)
    d = gt.ThinDisc(0.0, jnp.inf)
    model = gt.LampPostModel(h=5.0)
    return gt.emissivity_profile(m, d, model, n_samples=300)


def test_emissivity_powerlaw_falloff(lamppost_profile):
    prof = lamppost_profile
    e = np.asarray(prof.emissivity_at(jnp.asarray([10.0, 20.0, 40.0])))
    slope = np.log(e[2] / e[0]) / np.log(4.0)
    assert -3.6 < slope < -2.6  # ~r^-3


def test_emissivity_positive_and_times_monotone(lamppost_profile):
    prof = lamppost_profile
    n = int(prof.n)
    assert n > 100
    eps = np.asarray(prof.eps)[:n]
    assert (eps >= 0).all()
    t = np.asarray(prof.coordtime_at(jnp.asarray([10.0, 20.0, 40.0])))
    assert np.all(np.diff(t) > 0)
    # light-travel sanity: t(r) ≳ r - h for r >> h
    assert t[2] > 40.0 - 5.0


def test_beamed_source_velocity_normalized():
    m = gt.KerrMetric(M=1.0, a=0.5)
    model = gt.BeamedPointSource(r=10.0, beta=0.3)
    x, v = model.sample_position_velocity(m)
    from gradus_tpu.geodesics import propernorm

    nrm = float(propernorm(m.metric(x), v))
    assert np.isclose(nrm, -1.0, atol=1e-10)
    assert float(v[1]) > 0  # outflowing


def test_montecarlo_profile_consistent(lamppost_profile):
    """Monte-Carlo photon-count binning should roughly agree with the 1D
    sweep profile in slope."""
    m = gt.KerrMetric(M=1.0, a=0.998)
    d = gt.ThinDisc(0.0, jnp.inf)
    model = gt.LampPostModel(h=5.0)
    prof_mc = gt.emissivity_profile(
        m, d, model, sampler=gt.EvenSampler(domain=gt.BothHemispheres()),
        n_samples=2000,
    )
    e = np.asarray(prof_mc.emissivity_at(jnp.asarray([10.0, 40.0])))
    slope = np.log(e[1] / e[0]) / np.log(4.0)
    assert -4.0 < slope < -2.0


def test_tracegeodesics_corona_model_dispatch():
    """Reference-parity front door `tracegeodesics(m, model, lam_max)`
    (corona-models.jl:143-153): samples the model's local sky and traces."""
    import gradus_tpu as gt
    from gradus_tpu.integrate.status import StatusCodes

    m = gt.KerrMetric(M=1.0, a=0.0)
    gp = gt.tracegeodesics(
        m, gt.LampPostModel(), 2000.0, n_samples=32,
        geometry=gt.ThinDisc(0.0, 100.0),
    )
    st = np.asarray(gp.status)
    assert st.shape == (32,)
    assert (st == int(StatusCodes.IntersectedWithGeometry)).sum() > 10
    assert (st == int(StatusCodes.WithinInnerBoundary)).sum() > 0


def test_coronal_beaming_tetrad_matches_analytic():
    """Reference `test/unit/coronal-beaming.jl`: the generic `tetradframe`
    at a radially-boosted source reproduces the Gonzalez+17 analytic tetrad,
    and dr/dt = β√(-g_tt/g_rr) equals the closed form β(r²-2r+a²)/(r²+a²)
    on the axis."""
    from gradus_tpu.geodesics.tetrads import tetradframe, propernorm

    m = gt.KerrMetric(M=1.0, a=0.998)
    x = jnp.array([0.0, 3.0, np.deg2rad(0.01), 0.0])
    g5 = np.asarray(m.components(x[1], x[2]))  # (tt, rr, hh, pp, tp)

    def drdt(beta):
        return beta * np.sqrt(-g5[0] / g5[1])

    r, a = 3.0, 0.998
    np.testing.assert_allclose(
        drdt(1.0), (r**2 - 2 * r + a**2) / (r**2 + a**2), rtol=1e-6
    )

    beta = 0.25
    # analytic tetrad (Gonzalez+17 eq. 10, signature flipped)
    v_r = drdt(beta)
    A = 1.0 / np.sqrt(-g5[0] - v_r**2 * g5[1])
    e_t = A * np.array([1.0, v_r, 0.0, 0.0])
    B = np.sqrt(-g5[1] / g5[0])
    e_r = A * np.array([v_r * B, 1.0 / B, 0.0, 0.0])
    e_h = np.array([0.0, 0.0, np.sqrt(1.0 / g5[2]), 0.0])
    C = 1.0 / np.sqrt(-g5[0] * (g5[4] ** 2 - g5[0] * g5[3]))
    e_p = C * np.array([g5[4], 0.0, 0.0, -g5[0]])
    analytic = np.stack([e_t, e_r, e_h, e_p])

    v = jnp.array([1.0, float(v_r), 0.0, 0.0])
    ours = np.stack([np.asarray(e) for e in tetradframe(m, x, v)])

    G = np.asarray(m.metric(x))
    eta = np.einsum("ai,ij,bj->ab", ours, G, ours)
    np.testing.assert_allclose(eta, np.diag([-1.0, 1.0, 1.0, 1.0]), atol=1e-10)
    np.testing.assert_allclose(ours, analytic, rtol=1e-8, atol=1e-10)


def test_ring_corona_corotating_velocity_pin():
    """Reference `coronal-beaming.jl:72-74`: RingCorona(co_rotating,
    r=2.082, h=50.0) at a=0.998 ≈ (1.204, 0, 0, 0.300).

    The reference pin is an EXTERNAL hand-computed value rounded to 3
    decimals (the same file's first pin is commented out with "no idea why
    this one isn't matching" against the reference's own code); our
    implementation is the reference formula verbatim
    (SourceVelocities.co_rotating, extended.jl:20-25) and lands at
    (1.20443, 0, 0, 0.30095) — asserted vs the pin at 5e-3 plus our own
    tight determinism pin."""
    m = gt.KerrMetric(M=1.0, a=0.998)
    model = gt.RingCorona(r=2.082, h=50.0, vf="co_rotating")
    x, v = model.sample_position_velocity(m)
    np.testing.assert_allclose(
        np.asarray(v), [1.204, 0.0, 0.0, 0.300], rtol=5e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(v), [1.2044281, 0.0, 0.0, 0.3009455], rtol=1e-5, atol=1e-8
    )
