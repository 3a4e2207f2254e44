"""Diagnose the f32 line-profile pipeline failure (VERDICT r3 weak #1b).

Runs the test_precision_parity.py::test_f32_f64_lineprofile_parity workload
in both dtypes and prints per-stage health: offset-solver ok rates, gmin/gmax
rows, branch tables, final bins.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

import gradus_tpu as gt
from gradus_tpu.transfer import transferfunctions, integrate_lineprofile


def profile(dtype):
    m = gt.KerrMetric(M=jnp.asarray(1.0, dtype), a=jnp.asarray(0.6, dtype))
    x = jnp.asarray([0.0, 1000.0, np.deg2rad(45.0), 0.0], dtype)
    d = gt.ThinDisc(0.0, jnp.inf)
    tfs, s = transferfunctions(
        m, x, d, num_re=8, max_re=30.0, N=20, N_extrema=8, Ng=32,
        return_samples=True,
    )
    ok = np.asarray(s["ok"])
    print(f"--- {np.dtype(dtype).name} ---")
    print("ok rate per radius:", ok.mean(axis=1))
    print("radii:", np.asarray(tfs.radii))
    print("gmin:", np.asarray(tfs.gmin))
    print("gmax:", np.asarray(tfs.gmax))
    lf = np.asarray(tfs.lower_f)
    uf = np.asarray(tfs.upper_f)
    print("lower_f finite frac:", np.isfinite(lf).mean(), "max:", np.nanmax(lf))
    print("upper_f finite frac:", np.isfinite(uf).mean(), "max:", np.nanmax(uf))
    bins = jnp.linspace(0.1, 1.5, 80, dtype=dtype)
    flux = np.asarray(
        integrate_lineprofile(lambda r: r**-3.0, tfs, bins, n_radii=200)
    )
    print("flux finite frac:", np.isfinite(flux).mean())
    return flux


f64 = profile(jnp.float64)
f32 = profile(jnp.float32)
nz = f64 > 1e-5 * f64.max()
rel = np.abs(f32[nz] - f64[nz]) / f64[nz]
print("median rel:", np.median(rel), "p90:", np.percentile(rel, 90), "max:", rel.max())
bad = np.nonzero((np.abs(f32 - f64) / np.maximum(f64, 1e-12) > 0.05) & nz)[0]
print("bad bins:", bad[:20])
print("f64 bins[bad]:", f64[bad[:10]])
print("f32 bins[bad]:", f32[bad[:10]])
