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
prof = gt.emissivity_profile(m, d, model, n_samples=500)
t0 = gt.continuum_time(m, x, model)
bins = jnp.linspace(0.0, 1.5, 100)
tbins = jnp.linspace(0.0, 100.0, 100)
radii = InverseGrid()(float(gt.isco(m)), 100.0, 10)

for ng in (64, 256):
    tfs = transferfunctions(m, x, d, radii=radii, beta0=2.0, Ng=ng)
    flux = np.asarray(integrate_lagtransfer(prof, tfs, bins, tbins, t0=t0, n_radii=100))
    freq, tau = gt.lag_frequency(np.asarray(tbins), np.where(flux == 0, np.nan, flux))
    print(f"Ng={ng}: tau131={float(tau[131]):.5f} rel={(float(tau[131])-GOLD)/GOLD:+.2%}", flush=True)
    # impulse-response centroid for diagnosis
    psi = np.nansum(np.where(np.isnan(flux),0,flux), axis=0)
    tb = np.asarray(tbins)
    print(f"   centroid={float((tb*psi).sum()/psi.sum()):.4f}", flush=True)
