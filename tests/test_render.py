"""Render smoke tests with reference golden fingerprints.

Parity targets from `test/smoke-tests/rendergeodesics.jl:42-60` (camera at
r = 100, i = 85°, 20×20 pixels, α,β ∈ (-9.5, 9.5), λmax = 200):
- Kerr shadow: Σ(non-NaN) = 9009.452876609641  (rtol 1e-1)
- Kerr + ThinDisc(0, 40): Σ = 38412.08347901267 (rtol 1e-1)
"""

import jax.numpy as jnp
import numpy as np

from gradus_tpu.camera import ConstPointFunctions, rendergeodesics
from gradus_tpu.geometry import ThinDisc
from gradus_tpu.integrate import StatusCodes
from gradus_tpu.metrics import KerrMetric, JohannsenMetric

CAMERA = dict(
    image_width=20,
    image_height=20,
    alpha_lims=(-9.5, 9.5),
    beta_lims=(-9.5, 9.5),
)
X_OBS = jnp.array([0.0, 100.0, np.deg2rad(85.0), 0.0])


def _nansum(img):
    return float(jnp.nansum(img))


def test_shadow_fingerprint_kerr():
    m = KerrMetric(M=1.0, a=0.0)
    _, _, img = rendergeodesics(m, X_OBS, None, 200.0, **CAMERA)
    assert np.isclose(_nansum(img), 9009.452876609641, rtol=1e-1)


def test_shadow_fingerprint_johannsen():
    m = JohannsenMetric(M=1.0, a=0.0)
    _, _, img = rendergeodesics(m, X_OBS, None, 200.0, **CAMERA)
    assert np.isclose(_nansum(img), 9009.448935932085, rtol=1e-1)


def test_thin_disc_fingerprint_kerr():
    m = KerrMetric(M=1.0, a=0.0)
    d = ThinDisc(0.0, 40.0)
    _, _, img = rendergeodesics(m, X_OBS, d, 200.0, **CAMERA)
    assert np.isclose(_nansum(img), 38412.08347901267, rtol=1e-1)


def test_redshift_render_physics():
    """Disc redshift image: finite g where the disc was hit, with the
    approaching side blueshifted (g > 1) and receding side redshifted."""
    m = KerrMetric(M=1.0, a=0.5)
    d = ThinDisc(0.0, 40.0)
    pf = ConstPointFunctions.redshift(m, X_OBS) @ ConstPointFunctions.filter_intersected()
    _, _, img = rendergeodesics(
        m,
        X_OBS,
        d,
        300.0,
        pf=pf,
        image_width=30,
        image_height=20,
        alpha_lims=(-25.0, 25.0),
        beta_lims=(-15.0, 15.0),
    )
    img = np.asarray(img)
    finite = np.isfinite(img)
    assert finite.sum() > 50  # a good chunk of the image is disc
    g = img[finite]
    assert (g > 0).all() and (g < 2.0).all()
    # one side approaches (max g > 1), the other recedes (min g < 0.9)
    assert g.max() > 1.0
    assert g.min() < 0.9


def test_status_distribution():
    m = KerrMetric(M=1.0, a=0.0)
    d = ThinDisc(0.0, 40.0)
    from gradus_tpu.camera.render import prerendergeodesics

    _, _, cache = prerendergeodesics(m, X_OBS, d, 200.0, **CAMERA)
    statuses = np.asarray(cache.points.status)
    # all three classes present: disc hits, captures, escapes
    assert (statuses == int(StatusCodes.IntersectedWithGeometry)).sum() > 100
    assert (statuses == int(StatusCodes.NoStatus)).sum() > 10
