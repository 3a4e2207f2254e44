import sys; sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp, time
import gradus_tpu as gt
from gradus_tpu.corona.extended import ring_corona_profile_hybrid

m = gt.KerrMetric(M=1.0, a=0.5)
d = gt.ThinDisc(0.0, 100.0)
ring = gt.RingCorona(r=3.0, h=6.0)
rq = jnp.asarray([2.0, 2.6, 3.0, 3.4, 4.0, 5.0, 8.0, 15.0, 30.0])
eps = {}
for nb in (10, 20, 40):
    t0=time.time()
    prof = ring_corona_profile_hybrid(m, d, ring, n_beta=nb, n_angles=256)
    eps[nb] = np.asarray(prof.emissivity_at(rq))
    print(f"nb={nb} t={time.time()-t0:.1f}s eps={np.array2string(eps[nb], precision=5, max_line_width=220)}", flush=True)
print("20 vs 40 rel:", np.abs(eps[20]/eps[40]-1))
print("10 vs 40 rel:", np.abs(eps[10]/eps[40]-1))
