import sys; sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp, time
import gradus_tpu as gt
from gradus_tpu.corona.extended import ring_corona_profile

m = gt.KerrMetric(M=1.0, a=0.998)
d = gt.ThinDisc(0.0, 500.0)
ring = gt.RingCorona(r=3.0, h=6.0)
rq = jnp.asarray([1.8, 2.2, 2.6, 3.0, 3.4, 3.8, 4.2, 5.0, 8.0, 15.0])
for nb in (10, 20, 40, 80):
    t0=time.time()
    prof = ring_corona_profile(m, d, ring, n_beta=nb, n_angles=256)
    e = np.asarray(prof.emissivity_at(rq))
    print(f"nb={nb} t={time.time()-t0:.1f}s eps={np.array2string(e, precision=5, max_line_width=200)}", flush=True)
    # branch support: min rho per slice per arm
    for arm_name in ("left","right"):
        arm = getattr(prof, arm_name)
        r_s = np.asarray(arm.radii); n = np.asarray(arm.n)
        rmin = np.array([r_s[i, :int(n[i])].min() if n[i]>0 else np.nan for i in range(r_s.shape[0])])
        print(f"  {arm_name} rho_min per slice: min={np.nanmin(rmin):.3f} max={np.nanmax(rmin):.3f}", flush=True)
