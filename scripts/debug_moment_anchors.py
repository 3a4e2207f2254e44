import sys; sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
import gradus_tpu as gt

def mom(angle, re, **kw):
    m = gt.KerrMetric(M=1.0, a=0.998)
    d = gt.ThinDisc(0.0, jnp.inf)
    x = jnp.array([0.0, 100_000.0, np.deg2rad(angle), 0.0])
    _, s = gt.cunningham_transfer_function(m, x, d, jnp.array([float(re)]), N=80, return_samples=True, **kw)
    ok = np.asarray(s["ok"][0]); f = np.asarray(s["f"][0]); gs = np.asarray(s["gstar"][0])
    valid = ok & np.isfinite(f)
    return (f[valid]*gs[valid]).sum()/valid.sum()

ANCH = [
    (3.0, 4.0, 0.14048899037409682),
    (30.0, 4.0, 0.11958152396826184),
    (35.0, 4.0, 0.10846177995555085),
    (74.0, 4.0, 0.05550300700779827),
    (85.0, 4.0, 0.03602870590038378),
    (30.0, 7.0, 0.12205125501900763),
    (30.0, 10.0, 0.1265019201038228),
    (30.0, 15.0, 0.12875961522283233),
    (30.0, 1000.0, 0.13319637850028626),
]
for angle, re, golden in ANCH:
    v = mom(angle, re)
    print(f"i={angle:5.1f} re={re:6.1f}: ours={v:.6f} golden={golden:.6f} diff={abs(v-golden):.2e} rel={(v-golden)/golden:+.2%}", flush=True)
# depth convergence at re4 i30
m1 = mom(30.0, 4.0, N_extrema=15)
m2 = mom(30.0, 4.0, N_extrema=30)
print(f"depth: {m1:.6f} vs {m2:.6f} d={abs(m1-m2):.1e}", flush=True)
