"""Fast-tier smoke coverage for the subsystems whose golden-parity tests are
marked `slow` (transfer functions, line profiles, reverberation, forward-mode
differentiation through the integrator). Tiny workloads, physical assertions —
the full golden values live in the slow tier (`pytest -m slow`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gradus_tpu as gt
from gradus_tpu.transfer import (
    transferfunctions,
    integrate_lineprofile,
    integrate_lagtransfer,
)


@pytest.fixture(scope="module")
def tiny_tfs():
    """Small Cunningham transfer-function table: Kerr a=0.6, i=45°."""
    m = gt.KerrMetric(M=1.0, a=0.6)
    x = jnp.array([0.0, 1000.0, np.deg2rad(45.0), 0.0])
    d = gt.ThinDisc(0.0, jnp.inf)
    tfs = transferfunctions(
        m, x, d, num_re=4, max_re=20.0, N=12, N_extrema=5, Ng=24
    )
    return m, x, d, tfs


def test_ctf_smoke(tiny_tfs):
    """g✶-branch structure is physical: 0 < gmin < gmax, finite positive f."""
    _, _, _, tfs = tiny_tfs
    gmin = np.asarray(tfs.gmin)
    gmax = np.asarray(tfs.gmax)
    assert np.all(gmin > 0.0)
    assert np.all(gmax > gmin)
    assert np.all(gmax < 1.5)
    lower = np.asarray(tfs.lower_f)
    upper = np.asarray(tfs.upper_f)
    assert np.isfinite(lower[np.isfinite(lower)]).any()
    assert np.nanmax(np.where(np.isfinite(upper), upper, np.nan)) > 0


def test_lineprofile_smoke(tiny_tfs):
    """r⁻³ line profile from the tiny table: normalized, edges in the
    physically allowed band for a=0.6 i=45°."""
    _, _, _, tfs = tiny_tfs
    bins = jnp.linspace(0.1, 1.5, 60)
    flux = np.asarray(
        integrate_lineprofile(lambda r: r**-3.0, tfs, bins, n_radii=80)
    )
    assert np.isclose(flux.sum(), 1.0, rtol=1e-8)
    nz = np.nonzero(flux > 0)[0]
    assert 0.2 < bins[nz[0]] < 0.8  # red edge
    assert 0.9 < bins[nz[-1]] < 1.4  # blue edge


def test_lagtransfer_smoke(tiny_tfs):
    """2D (g, t) lag transfer + FFT lag spectrum: finite, causal, normalized."""
    m, x, d, tfs = tiny_tfs
    prof = gt.emissivity_profile(m, d, gt.LampPostModel(), n_samples=200)
    bins = jnp.linspace(0.0, 1.5, 40)
    tbins = jnp.linspace(0.0, 100.0, 50)
    t0 = float(x[1])  # continuum_time ≈ r_obs for a distant observer
    flux = np.asarray(
        integrate_lagtransfer(prof, tfs, bins, tbins, t0=t0, n_radii=50)
    )
    assert np.isclose(np.nansum(flux), 1.0, rtol=1e-6)
    freq, tau = gt.lag_frequency(
        np.asarray(tbins), np.where(flux == 0, np.nan, flux), flo=1e-3
    )
    assert np.isfinite(tau[1:]).all()
    # low-frequency echoes trail the continuum
    assert np.nanmean(tau[1:10]) > 0.0


def test_forward_diff_smoke():
    """jax.jacfwd through the full trace vs central finite differences."""
    m = gt.SchwarzschildMetric(M=1.0)
    d = gt.ThinDisc(0.0, 100.0)
    from gradus_tpu.camera.impact import map_impact_parameters

    def hit_radius(beta):
        x = jnp.array([0.0, 100.0, np.radians(60.0), 0.0])
        v = map_impact_parameters(m, x, jnp.asarray(0.0), beta)
        gp = gt.trace_geodesics(m, x, v, (0.0, 300.0), geometry=d)
        return gp.x[1]

    beta0 = jnp.asarray(10.0)
    val, grad = jax.jvp(hit_radius, (beta0,), (jnp.ones(()),))
    assert float(val) > 6.0
    eps = 1e-3
    fd = (float(hit_radius(beta0 + eps)) - float(hit_radius(beta0 - eps))) / (
        2 * eps
    )
    np.testing.assert_allclose(float(grad), fd, rtol=5e-3)
