import sys; sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
import gradus_tpu as gt
from gradus_tpu.camera.grids import InverseGrid
from gradus_tpu.transfer import transferfunctions, integrate_lagtransfer

m = gt.KerrMetric(M=1.0, a=0.998)
x = jnp.array([0.0, 10000.0, np.deg2rad(45.0), 0.0])
d = gt.ThinDisc(0.0, jnp.inf)
model = gt.LampPostModel()
GOLD = 9.322742661315855

def tau131(n_tf_radii=10, n_samples=500, n_radii=100, dt0=0.0, tbn=100):
    radii = InverseGrid()(float(gt.isco(m)), 100.0, n_tf_radii)
    tfs = transferfunctions(m, x, d, radii=radii, beta0=2.0)
    prof = gt.emissivity_profile(m, d, model, n_samples=n_samples)
    t0 = gt.continuum_time(m, x, model) + dt0
    bins = jnp.linspace(0.0, 1.5, 100)
    tbins = jnp.linspace(0.0, 100.0, tbn)
    flux = integrate_lagtransfer(prof, tfs, bins, tbins, t0=t0, n_radii=n_radii)
    flux = np.asarray(flux)
    freq, tau = gt.lag_frequency(np.asarray(tbins), np.where(flux == 0, np.nan, flux))
    return float(tau[131]) if tbn == 100 else (freq, tau)

base = tau131()
print(f"base        : {base:.5f} rel={(base-GOLD)/GOLD:+.2%}", flush=True)
v = tau131(dt0=-0.073); print(f"t0-0.073    : {v:.5f} rel={(v-GOLD)/GOLD:+.2%}", flush=True)
v = tau131(n_samples=1000); print(f"nsamp=1000  : {v:.5f} rel={(v-GOLD)/GOLD:+.2%}", flush=True)
v = tau131(n_radii=400); print(f"nrad=400    : {v:.5f} rel={(v-GOLD)/GOLD:+.2%}", flush=True)
v = tau131(n_tf_radii=20); print(f"tfradii=20  : {v:.5f} rel={(v-GOLD)/GOLD:+.2%}", flush=True)
