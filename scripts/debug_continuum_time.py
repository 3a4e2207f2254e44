import sys; sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
import gradus_tpu as gt

m = gt.KerrMetric(M=1.0, a=0.998)
x = jnp.array([0.0, 10000.0, np.deg2rad(45.0), 0.0])
model = gt.LampPostModel()
t0 = float(gt.continuum_time(m, x, model))
print("our t0:", t0)

# independent check: dense (alpha, beta) scan for the ray minimizing the
# closest approach to the corona position, reading its arrival time
from gradus_tpu.camera.impact import map_impact_parameters
from gradus_tpu.integrate.tracing import trace_geodesics_dense, domain_upper_hemisphere
from gradus_tpu.utils.linalg import spherical_to_cartesian

xs_src, _ = model.sample_position_velocity(m)
target = np.asarray(spherical_to_cartesian(xs_src))
print("corona cart:", target)

def scan(al_c, be_c, width, n):
    al = jnp.linspace(al_c-width, al_c+width, n)
    be = jnp.linspace(be_c-width, be_c+width, n)
    A, B = jnp.meshgrid(al, be, indexing="ij")
    v = map_impact_parameters(m, x, A.ravel(), B.ravel())
    xs = jnp.broadcast_to(x, v.shape)
    gp, traj, lam, nst = trace_geodesics_dense(m, xs, v, (0.0, 2.0*x[1]), n_save=800,
        chart_outer=2.0*x[1])
    P = np.asarray(spherical_to_cartesian(np.asarray(traj)[..., 0:4]))
    d2 = ((P - target)**2).sum(-1)
    nst = np.asarray(nst)
    mask = np.arange(P.shape[1])[None,:] < nst[:,None]
    d2 = np.where(mask, d2, np.inf)
    best_per_ray = d2.min(1)
    i = int(np.argmin(best_per_ray))
    j = int(np.argmin(d2[i]))
    tt = np.asarray(traj)[i, j, 0]
    return float(np.asarray(A.ravel())[i]), float(np.asarray(B.ravel())[i]), float(np.sqrt(best_per_ray[i])), float(tt)

al, be, dist, tt = scan(0.0, 0.0, 8.0, 21)
print("coarse:", al, be, "dist", dist, "t", tt)
al, be, dist, tt = scan(al, be, 1.0, 21)
print("fine:  ", al, be, "dist", dist, "t", tt)
al, be, dist, tt = scan(al, be, 0.12, 21)
print("finer: ", al, be, "dist", dist, "t", tt)
