"""Measure binflux at the reference test-2d.jl config (VERDICT r4 next #4).

Reference golden: 337 observer-to-disc intersections, fluxsum ≈ 3.9126785
(atol 1e-2) for Kerr a=0.998, observer r=1e6 i=30°, ThinDisc(isco, 500),
LampPost h=10, PolarPlane(GeometricGrid(), 20, 20), binflux N_t=N_E=100.

Since H = F/(ΔE·Δt) with ΣF = 1, fluxsum = 1/(de·dt) pins the extremal
(E, t) ranges of the hit set — a strong geometric + timing fingerprint.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
import gradus_tpu as gt
from gradus_tpu.camera.planes import PolarPlane
from gradus_tpu.camera.grids import GeometricGrid

m = gt.KerrMetric(M=1.0, a=0.998)
x = jnp.array([0.0, 1e6, np.deg2rad(30.0), 0.0])
d = gt.ThinDisc(float(gt.isco(m)), 500.0)
model = gt.LampPostModel(h=10.0, theta=1e-3)
plane = PolarPlane(GeometricGrid(), Nr=20, Ntheta=20)

sampler = gt.EvenSampler(domain=gt.BothHemispheres(), generator="golden")
tf = gt.lagtransfer(m, x, d, model, plane=plane, n_samples=100, sampler=sampler)
hits = int(np.asarray(tf["hit"]).sum())
print("intersections:", hits, "(reference: 337)")

# corona-hit fingerprint (reference: 58 of 100 rays intersect)
from gradus_tpu.corona.samplers import sky_angles_to_velocity
from gradus_tpu.integrate.tracing import trace_geodesics, domain_upper_hemisphere
from gradus_tpu.integrate.status import StatusCodes as SC

x_src, v_src = model.sample_position_velocity(m)
idx = jnp.arange(1, 101, dtype=x_src.dtype)
elev, az = sampler.sample_angles(idx, 100)
v = sky_angles_to_velocity(m, x_src, v_src, elev, az)
gps = trace_geodesics(
    m,
    jnp.broadcast_to(x_src, v.shape),
    v,
    (0.0, 2e6),
    geometry=d,
    terminate_fns=(domain_upper_hemisphere(),),
    constrain=False,
)
n_corona = int(np.asarray(gps.status == SC.IntersectedWithGeometry).sum())
print("corona hits:", n_corona, "(reference: 58)")

t, E, H = gt.binflux(tf, N_t=100, N_E=100)
fluxsum = float(np.nansum(np.asarray(H)))
print("fluxsum:", fluxsum, "(reference: 3.9126785201177956)")
de = float(E[1] - E[0])
dt = float(t[1] - t[0])
print("de", de, "dt", dt, "1/(de*dt)", 1.0 / (de * dt))
Eh = np.asarray(E)
th = np.asarray(t)
print("E range", Eh.min(), Eh.max(), "t range", th.min(), th.max())

# --- decompose the t range -------------------------------------------------
from gradus_tpu.utils.linalg import equatorial_project as eqp
cr = np.asarray(tf["corona_r"]); ct = np.asarray(tf["corona_t"]); cn = int(np.asarray(tf["corona_n"]))
print("corona r range:", cr[0], cr[cn-1], " t range:", ct[:cn].min(), ct[:cn].max())
print("corona top radii:", cr[max(0,cn-6):cn])
hitm = np.asarray(tf["hit"])
r_o = np.asarray(eqp(tf["points"].x))[hitm]
t_o = np.asarray(tf["points"].x[..., 0])[hitm] - 1e6
from gradus_tpu.utils.interp import masked_sorted_interp
tc_o = np.asarray(masked_sorted_interp(jnp.asarray(r_o), tf["corona_r"], tf["corona_t"], tf["corona_n"]))
ttot = tc_o + t_o
i = np.argmax(ttot)
print("max-t ray: r_hit=", r_o[i], " t_ray=", t_o[i], " t_corona=", tc_o[i], " total=", ttot[i])
print("observer r_hit range:", r_o.min(), r_o.max())
