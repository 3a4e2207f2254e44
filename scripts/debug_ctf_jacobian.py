"""Check the CTF Jacobian d(rho,g)/d(alpha,beta) (jvp through the event)
against central finite differences, plus independent gmin/gmax via dense
theta scan. a=0.998, i=30, re=4."""

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
from gradus_tpu.transfer.solvers import (
    find_offset_for_radius,
    rtheta_to_alphabeta,
)
from gradus_tpu.camera.impact import map_impact_parameters
from gradus_tpu.integrate.tracing import trace_geodesics
from gradus_tpu.redshift import redshift_pointfunction
from gradus_tpu.utils.linalg import equatorial_project

A, ANGLE, RE = 0.998, 30.0, 4.0
m = gt.KerrMetric(M=1.0, a=A)
x = jnp.array([0.0, 100_000.0, np.deg2rad(ANGLE), 0.0])
disc = gt.DatumPlane(0.0)
lam_max = 2.0 * x[1]
pf = redshift_pointfunction(m, x)

# solve offsets for a few representative thetas (incl. near-extremal)
thetas = jnp.array([0.01, 0.7, np.pi / 2, np.pi - 0.01, np.pi - 0.003, 2.2])
res = find_offset_for_radius(
    m, x, disc, jnp.full(thetas.shape, RE), thetas, lam_max=lam_max
)
r_off = res[0]
print("r_off:", np.asarray(r_off))

al, be = rtheta_to_alphabeta(r_off, thetas)
ab = jnp.stack([al, be], axis=-1)


def rho_g(ab_):
    v = map_impact_parameters(m, x, ab_[..., 0], ab_[..., 1])
    xs = jnp.broadcast_to(x, v.shape)
    gp_ = trace_geodesics(
        m, xs, v, (0.0, lam_max), geometry=disc, chart_outer=2.0 * x[1]
    )
    g_ = pf(m, gp_, lam_max)
    return jnp.stack([equatorial_project(gp_.x), g_], axis=-1)


e_a = jnp.zeros_like(ab).at[..., 0].set(1.0)
e_b = jnp.zeros_like(ab).at[..., 1].set(1.0)
val, d_da = jax.jvp(rho_g, (ab,), (e_a,))
_, d_db = jax.jvp(rho_g, (ab,), (e_b,))
det = d_da[..., 0] * d_db[..., 1] - d_da[..., 1] * d_db[..., 0]
print("rho,g at solved points:\n", np.asarray(val))
print("jvp d/dalpha:\n", np.asarray(d_da))
print("jvp d/dbeta:\n", np.asarray(d_db))

for eps in (1e-3, 1e-4, 1e-5):
    up_a = rho_g(ab + eps * e_a)
    dn_a = rho_g(ab - eps * e_a)
    up_b = rho_g(ab + eps * e_b)
    dn_b = rho_g(ab - eps * e_b)
    fd_da = (up_a - dn_a) / (2 * eps)
    fd_db = (up_b - dn_b) / (2 * eps)
    fd_det = fd_da[..., 0] * fd_db[..., 1] - fd_da[..., 1] * fd_db[..., 0]
    print(f"eps={eps}: fd det / jvp det = {np.asarray(fd_det / det)}")

# independent gmin / gmax: dense theta scan near the extremes + parabola fit
for center, name in ((0.0, "gmin"), (np.pi, "gmax")):
    ths = jnp.linspace(center - 0.02, center + 0.02, 41)
    ths = jnp.where(jnp.abs(ths - center) < 1e-4, ths + 2e-4, ths)
    rr = find_offset_for_radius(
        m, x, disc, jnp.full(ths.shape, RE), ths, lam_max=lam_max
    )
    alb = rtheta_to_alphabeta(rr[0], ths)
    gg = rho_g(jnp.stack(alb, axis=-1))[:, 1]
    gg = np.asarray(gg)
    ths_n = np.asarray(ths)
    c = np.polyfit(ths_n - center, gg, 2)
    ext = c[2] - c[1] ** 2 / (4 * c[0])
    print(f"{name}: scan extreme={gg.min() if name=='gmin' else gg.max():.8f} "
          f"parabola={ext:.8f}")
