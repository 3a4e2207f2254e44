"""Measure the semi-analytic lag-transfer golden of test-2d.jl:35-64.

Reference: prof from 5000 golden-spiral corona samples; 5-radius inverse-grid
CTF table; integrate_lagtransfer with bins 0:1.5 (100), tbins 0:150 (100),
t0 = r_obs = 1e6, n_radii=1000. Goldens: sum(flux) ≈ 1 (atol 1e-2),
sum(flux[40, :]) ≈ 0.021759503160585468 (atol 1e-4; 0-based row 39).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
import gradus_tpu as gt
from gradus_tpu.camera.grids import InverseGrid
from gradus_tpu.transfer import transferfunctions, integrate_lagtransfer

m = gt.KerrMetric(M=1.0, a=0.998)
x = jnp.array([0.0, 1e6, np.deg2rad(30.0), 0.0])
isco = float(gt.isco(m))

prof = gt.emissivity_profile(
    m,
    gt.ThinDisc(isco, 500.0),
    gt.LampPostModel(h=10.0, theta=1e-3),
    n_samples=5000,
    sampler=gt.EvenSampler(domain=gt.BothHemispheres(), generator="golden"),
)

radii = InverseGrid()(isco, 100.0, 5)
d = gt.ThinDisc(0.0, 500.0)
itb = transferfunctions(m, x, d, radii=radii)

bins = jnp.linspace(0.0, 1.5, 100)
tbins = jnp.linspace(0.0, 150.0, 100)
flux = integrate_lagtransfer(
    prof,
    itb,
    bins,
    tbins,
    t0=float(x[1]),
    n_radii=1000,
    rmin=float(radii[0]),
    rmax=float(radii[-1]),
)
flux = np.asarray(flux)
print("sum(flux):", flux.sum(), "(reference: 1.0 atol 1e-2)")
print("sum(flux[39,:]):", flux[39, :].sum(), "(reference: 0.021759503160585468)")
print("sum(flux[38,:]):", flux[38, :].sum())
print("sum(flux[40,:]):", flux[40, :].sum())
