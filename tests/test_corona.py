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
