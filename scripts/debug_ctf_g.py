"""Independent verification of the CTF per-sample redshift g:

g_pipeline: generic dot-product using the traced endpoint velocity gp.v.
g_analytic: Cunningham closed form with the photon's CONSERVED
            lambda = p_phi/(-p_t) evaluated at the OBSERVER (exact,
            integration-error-free given the initial条件).

Disagreement => endpoint-velocity (event interpolation) error.
Also checks E/L conservation drift along the trace.
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
from gradus_tpu.transfer.solvers import find_offset_for_radius, rtheta_to_alphabeta
from gradus_tpu.camera.impact import map_impact_parameters
from gradus_tpu.integrate.tracing import trace_geodesics
from gradus_tpu.redshift import redshift_pointfunction
from gradus_tpu.redshift_analytic import analytic_redshift_pointfunction, regular_pdotu_inv
from gradus_tpu.utils.linalg import equatorial_project

A, ANGLE, RE = 0.998, 30.0, 4.0
m = gt.KerrMetric(M=1.0, a=A)
x = jnp.array([0.0, 100_000.0, np.deg2rad(ANGLE), 0.0])
disc = gt.DatumPlane(0.0)
lam_max = 2.0 * x[1]

thetas = jnp.linspace(-np.pi / 2, 3 * np.pi / 2, 17)[:-1] + 1e-3
res = find_offset_for_radius(m, x, disc, jnp.full(thetas.shape, RE), thetas, lam_max=lam_max)
r_off = res[0]
al, be = rtheta_to_alphabeta(r_off, thetas)
v = map_impact_parameters(m, x, al, be)
xs = jnp.broadcast_to(x, v.shape)
gp = trace_geodesics(m, xs, v, (0.0, lam_max), geometry=disc, chart_outer=2.0 * x[1])

pf = redshift_pointfunction(m, x)
g_pipe = np.asarray(pf(m, gp, lam_max))
pfa = analytic_redshift_pointfunction(m, x)
g_ana = np.asarray(pfa(m, gp, lam_max))

print("rho:", np.asarray(equatorial_project(gp.x)))
print("g_pipe:", g_pipe)
print("g_ana :", g_ana)
print("rel diff:", np.abs(g_pipe - g_ana) / g_ana)

# conservation drift: p_t, p_phi at both ends
g_obs = m.metric(gp.x_init)
g_hit = m.metric(gp.x)
p0 = jnp.einsum("...ij,...j->...i", g_obs, gp.v_init)
p1 = jnp.einsum("...ij,...j->...i", g_hit, gp.v)
E0, L0 = -np.asarray(p0[..., 0]), np.asarray(p0[..., 3])
E1, L1 = -np.asarray(p1[..., 0]), np.asarray(p1[..., 3])
print("E drift rel:", np.abs(E1 - E0) / E0)
print("L drift rel:", np.abs(L1 - L0) / np.abs(L0))

# g from endpoint-lambda with analytic Keplerian formula (isolates endpoint v)
lam_end = L1 / E1
g_end = np.asarray(regular_pdotu_inv(jnp.asarray(lam_end), 1.0, RE, A, np.pi / 2))
print("g from endpoint lambda:", g_end)
print("rel vs pipe:", np.abs(g_end - g_pipe) / g_pipe)
