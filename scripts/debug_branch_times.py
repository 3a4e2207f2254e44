import sys; sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
import gradus_tpu as gt
from gradus_tpu.camera.grids import InverseGrid
from gradus_tpu.camera.impact import map_impact_parameters
from gradus_tpu.transfer import transferfunctions
from gradus_tpu.integrate.status import StatusCodes
from gradus_tpu.utils.linalg import equatorial_project

m = gt.KerrMetric(M=1.0, a=0.998)
x = jnp.array([0.0, 10000.0, np.deg2rad(45.0), 0.0])
d = gt.ThinDisc(0.0, jnp.inf)
radii = InverseGrid()(float(gt.isco(m)), 100.0, 10)
tfs = transferfunctions(m, x, d, radii=radii, beta0=2.0)

# CTF-table flux-weighted mean disc->observer time per radius
rq = np.array([2.0, 4.0, 8.0, 15.0, 30.0, 60.0])
br = tfs.at_radius(jnp.asarray(rq))
f = np.asarray(jnp.concatenate([br["lower_f"], br["upper_f"]], axis=1))
t = np.asarray(jnp.concatenate([br["lower_t"], br["upper_t"]], axis=1))
t_ctf = (f * t).sum(1) / f.sum(1)

# independent: dense polar-plane render against the disc, weight each hit by
# its pixel area * g^0 (pure photon arrival, no emissivity), bin by radius
from gradus_tpu.camera.planes import PolarPlane
from gradus_tpu.camera.grids import GeometricGrid
plane = PolarPlane(GeometricGrid(), Nr=300, Ntheta=400, r_max=110.0)
al, be = plane.impact_parameters()
areas = np.asarray(plane.unnormalized_areas())
v = map_impact_parameters(m, x, jnp.asarray(al), jnp.asarray(be) + 2.0)
xs = jnp.broadcast_to(x, v.shape)
tr = gt.Tracer(m, geometry=d, chart_outer=2.0*float(x[1]))
gp = tr(xs, v, (0.0, 2.0*float(x[1])))
hit = np.asarray(gp.status) == int(StatusCodes.IntersectedWithGeometry)
rho = np.asarray(equatorial_project(gp.x))
tt = np.asarray(gp.x[:, 0])
for i, r in enumerate(rq):
    sel = hit & (np.abs(rho - r) < 0.05 * r)
    w = areas[sel]
    print(f"r={r:5.1f}: t_ctf={t_ctf[i]:9.4f} t_render={(w*tt[sel]).sum()/w.sum():9.4f} n={sel.sum()}")
