import sys; sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
import gradus_tpu as gt

def mom(tag, **kw):
    m = gt.KerrMetric(M=1.0, a=0.998)
    d = gt.ThinDisc(0.0, jnp.inf)
    x = jnp.array([0.0, 100_000.0, np.deg2rad(30.0), 0.0])
    _, s = gt.cunningham_transfer_function(
        m, x, d, jnp.array([1000.0]), N=80, return_samples=True, **kw
    )
    ok = np.asarray(s["ok"][0]); f = np.asarray(s["f"][0]); gs = np.asarray(s["gstar"][0])
    valid = ok & np.isfinite(f)
    v = (f[valid]*gs[valid]).sum()/valid.sum()
    print(f"{tag}: moment={v:.6f} n={valid.sum()} (golden 0.133196, +/-1% = [0.131864, 0.134528])", flush=True)
    # decompose: ill-zone contribution
    for hi in (1e-4, 1e-3, 1e-2):
        inner = valid & (gs > hi) & (gs < 1 - hi)
        print(f"   excl |g*-edge|<{hi}: mean={(f[inner]*gs[inner]).sum()/inner.sum():.6f} n={inner.sum()}", flush=True)
    return v

mom("default")
mom("h_reg=0", h_reg=0.0)
