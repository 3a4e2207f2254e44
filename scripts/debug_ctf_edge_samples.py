import sys; sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
import gradus_tpu as gt

def dump(angle, re):
    m = gt.KerrMetric(M=1.0, a=0.998)
    d = gt.ThinDisc(0.0, jnp.inf)
    x = jnp.array([0.0, 100_000.0, np.deg2rad(angle), 0.0])
    _, s = gt.cunningham_transfer_function(m, x, d, jnp.array([float(re)]), N=80,
                                           return_samples=True, h_reg=0.0)
    gs = np.asarray(s["gstar"][0]); f = np.asarray(s["f"][0]); ok = np.asarray(s["ok"][0])
    cond = np.asarray(s["cond"][0]); J = np.asarray(s["J"][0])
    edge = ok & ((gs > 1-1e-4) | (gs < 1e-4)) & (gs > 0) & (gs < 1)
    mid  = ok & (gs > 0.2) & (gs < 0.8)
    print(f"i={angle} re={re}:")
    print("  edge cond:", np.array2string(np.sort(cond[edge]), precision=2, max_line_width=200))
    print("  edge f   :", np.array2string(f[edge], precision=4, max_line_width=200))
    print(f"  mid cond: min={cond[mid].min():.2e} med={np.median(cond[mid]):.2e}", flush=True)

dump(30.0, 4.0)
dump(30.0, 1000.0)
dump(74.0, 4.0)
