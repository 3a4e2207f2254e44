"""Line-profile API matrix (reference `test/line-profiles/test-api.jl`):
both methods accept a traced emissivity profile and return a normalized flux."""

import jax.numpy as jnp
import numpy as np
import pytest

import gradus_tpu as gt
from gradus_tpu.camera.planes import PolarPlane
from gradus_tpu.camera.grids import GeometricGrid


@pytest.fixture(scope="module")
def setup():
    m = gt.KerrMetric(M=1.0, a=0.6)
    x = jnp.array([0.0, 1000.0, np.deg2rad(60.0), 0.0])
    d = gt.ThinDisc(0.0, 250.0)
    prof = gt.emissivity_profile(
        m, gt.ThinDisc(0.0, jnp.inf), gt.LampPostModel(), n_samples=100
    )
    return m, x, d, prof


def test_profile_with_transferfunction_method(setup):
    m, x, d, prof = setup
    bins, flux = gt.lineprofile(
        m, x, d, profile=prof, method=gt.TransferFunctionMethod(),
        num_re=3, N=20, N_extrema=6, Ng=32,
    )
    np.testing.assert_allclose(float(jnp.sum(flux)), 1.0, atol=1e-4)


def test_profile_with_binning_method(setup):
    m, x, d, prof = setup
    plane = PolarPlane(GeometricGrid(), Nr=10, Ntheta=10, r_max=90.0)
    bins, flux = gt.lineprofile(
        m, x, d, profile=prof, method=gt.BinningMethod(), plane=plane,
    )
    np.testing.assert_allclose(float(jnp.sum(flux)), 1.0, atol=1e-4)
