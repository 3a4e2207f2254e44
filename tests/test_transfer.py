"""Transfer functions + line profile — reference golden parity.

These run the full batched offset-solver / CTF / integration pipeline, so they
are the slowest tests in the suite (while-loop compile + ~10⁴ traced
geodesics on CPU).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import gradus_tpu as gt


@pytest.mark.slow
def test_offset_solver_flat_and_kerr():
    """Offset root-finder hits requested emission radii to ~1e-7."""
    m = gt.SchwarzschildMetric(M=1.0)
    x = jnp.array([0.0, 1000.0, np.deg2rad(60.0), 0.0])
    d = gt.DatumPlane(0.0)
    r_targets = jnp.array([6.0, 10.0, 20.0])
    thetas = jnp.array([np.pi / 2, np.pi / 2, 0.3])
    r_off, gp, resid = gt.find_offset_for_radius(m, x, d, r_targets, thetas)
    assert np.all(np.isfinite(np.asarray(r_off)))
    np.testing.assert_array_less(np.abs(np.asarray(resid)), 1e-6)
    # offsets are close to (but lensed slightly off) the target radii;
    # |sin| because polar rays legitimately unwrap θ past the pole
    rho = np.asarray(gp.x[:, 1] * jnp.abs(jnp.sin(gp.x[:, 2])))
    np.testing.assert_allclose(rho, np.asarray(r_targets), rtol=1e-6)


@pytest.fixture(scope="module")
def kerr_line_profile():
    """Reference `test/line-profiles/test-cunningham.jl:10-22`: Kerr a=0.6,
    i=60°, ThinDisc(0, 250), bins 0.1:1.3×100, N=40, numrₑ=30."""
    m = gt.KerrMetric(M=1.0, a=0.6)
    x = jnp.array([0.0, 1000.0, np.deg2rad(60.0), 0.0])
    d = gt.ThinDisc(0.0, 250.0)
    bins = jnp.linspace(0.1, 1.3, 100)
    bins_out, flux = gt.lineprofile(m, x, d, bins=bins, N=40, num_re=30)
    return np.asarray(bins_out), np.asarray(flux)


@pytest.mark.slow
def test_lineprofile_edges_golden(kerr_line_profile):
    bins, flux = kerr_line_profile
    nz = np.nonzero(flux > 0)[0]
    g_low = bins[nz[0]]
    g_high = bins[nz[-1]]
    assert np.isclose(g_low, 0.355, atol=0.05)
    assert np.isclose(g_high, 1.2, atol=0.05)


@pytest.mark.slow
def test_lineprofile_normalized(kerr_line_profile):
    _, flux = kerr_line_profile
    np.testing.assert_allclose(flux.sum(), 1.0, rtol=1e-10)
    assert (flux >= 0).all()


@pytest.mark.slow
def test_lineprofile_shape(kerr_line_profile):
    """Double-horned profile: the blue (high-g) peak is the global max and
    exceeds the red peak."""
    bins, flux = kerr_line_profile
    peak_g = bins[np.argmax(flux)]
    assert 0.9 < peak_g < 1.25


@pytest.mark.slow
def test_johannsen_psaltis_lineprofile_edges_golden():
    """Reference `test/line-profiles/test-cunningham.jl:25-40`:
    JohannsenPsaltis ϵ3=2, a=0.6, i=60° — deformation shifts the red edge to
    g_low ≈ 0.27 (Kerr: 0.355); blue edge unchanged at ≈1.2."""
    m = gt.JohannsenPsaltisMetric(M=1.0, a=0.6, eps3=2.0)
    x = jnp.array([0.0, 1000.0, np.deg2rad(60.0), 0.0])
    d = gt.ThinDisc(0.0, 250.0)
    bins = jnp.linspace(0.1, 1.3, 100)
    bins_out, flux = gt.lineprofile(m, x, d, bins=bins, N=40, num_re=30)
    bins_out, flux = np.asarray(bins_out), np.asarray(flux)
    nz = np.nonzero(flux > 0)[0]
    assert np.isclose(bins_out[nz[0]], 0.27, atol=0.05)
    assert np.isclose(bins_out[nz[-1]], 1.2, atol=0.05)
    np.testing.assert_allclose(flux.sum(), 1.0, rtol=1e-10)


def _ctf_moment(a, angle, re, **kwargs):
    """Σ(f·g✶)/N over the raw probe samples (reference `measure_ctf`,
    `test/smoke-tests/cunningham-transfer-functions.jl:19-21`)."""
    m = gt.KerrMetric(M=1.0, a=a)
    d = gt.ThinDisc(0.0, jnp.inf)
    x = jnp.array([0.0, 100_000.0, np.deg2rad(angle), 0.0])
    _, s = gt.cunningham_transfer_function(
        m, x, d, jnp.array([re]), N=80, return_samples=True, **kwargs
    )
    ok = np.asarray(s["ok"][0])
    f = np.asarray(s["f"][0])
    gs = np.asarray(s["gstar"][0])
    valid = ok & np.isfinite(f)
    return (f[valid] * gs[valid]).sum() / valid.sum()


@pytest.mark.slow
def test_ctf_moment_re4_golden():
    """BASELINE anchor: CTF moment at a=0.998, i=30°, rₑ=4
    (`test/smoke-tests/cunningham-transfer-functions.jl:31`)."""
    np.testing.assert_allclose(
        _ctf_moment(0.998, 30.0, 4.0), 0.11958152396826184, atol=1e-3
    )


@pytest.mark.slow
def test_ctf_moment_re1000_golden():
    """BASELINE anchor: extreme-radius CTF moment at a=0.998, i=30°, rₑ=1000
    (`test/smoke-tests/cunningham-transfer-functions.jl:39`)."""
    np.testing.assert_allclose(
        _ctf_moment(0.998, 30.0, 1000.0), 0.13319637850028626, rtol=1e-2
    )


@pytest.mark.slow
def test_thick_disc_ctf_golden():
    """Reference `test/transfer-functions/test-thick-disc.jl:8-11`:
    ShakuraSunyaev, Kerr a=0.998, i=75°, rₑ=3, β₀=2 → Σf = 14.64279.
    We match to 0.2% (residual is golden-section probe placement;
    the reference's own atol 1e-4 requires bit-identical Optim probes)."""
    m = gt.KerrMetric(M=1.0, a=0.998)
    x = jnp.array([0.0, 10000.0, np.deg2rad(75.0), 0.0])
    d = gt.ShakuraSunyaev.from_metric(m)
    _, s = gt.cunningham_transfer_function(
        m, x, d, jnp.array([3.0]), beta0=2.0, return_samples=True
    )
    ok = np.asarray(s["ok"][0])
    f = np.asarray(s["f"][0])
    total = f[ok & np.isfinite(f)].sum()
    np.testing.assert_allclose(total, 14.64279128586961, rtol=5e-3)
