"""Kerr (Boyer-Lindquist) and Schwarzschild metrics.

Physics parity with reference `src/metrics/kerr-metric.jl` (line element docs at
:38-60); analytic ISCO from Bardeen, Press & Teukolsky (1972) as in the
reference's first-order module (`src/metrics/kerr-metric-first-order.jl`).
"""

from __future__ import annotations

import jax.numpy as jnp

from gradus_tpu.metrics.base import AbstractMetric, metric_dataclass

__all__ = ["KerrMetric", "SchwarzschildMetric", "kerr_isco", "convert_angles"]


@metric_dataclass
class KerrMetric(AbstractMetric):
    M: float = 1.0
    a: float = 0.0

    def components5(self, r, theta):
        M, a = self.M, self.a
        R = 2.0 * M
        sin2 = jnp.sin(theta) ** 2
        cos2 = 1.0 - sin2
        sigma = r * r + a * a * cos2
        inv_sigma = 1.0 / sigma
        delta = r * r + a * a - R * r
        gamma = sin2 * R * r * a

        tt = -(1.0 - (R * r) * inv_sigma)
        rr = sigma / delta
        hh = sigma
        pp = sin2 * (r * r + a * a + (gamma * a) * inv_sigma)
        tp = -gamma * inv_sigma
        return (tt, rr, hh, pp, tp)

    def components(self, r, theta):
        r, theta = jnp.broadcast_arrays(
            jnp.asarray(r, jnp.result_type(r, theta, float)), theta
        )
        return jnp.stack(self.components5(r, theta), axis=-1)

    def components5_jac(self, r, theta):
        """Hand-derived value + (∂_r, ∂_θ) of the 5 Kerr components.

        Replaces the two-jvp AD fallback in the geodesic RHS hot loop (7 calls
        per adaptive step); parity with the AD path is asserted to near
        machine precision in tests/test_metrics.py."""
        M, a = self.M, self.a
        R = 2.0 * M
        s = jnp.sin(theta)
        c = jnp.cos(theta)
        sin2 = s * s
        ds2 = 2.0 * s * c  # d(sin²θ)/dθ
        cos2 = 1.0 - sin2
        a2 = a * a
        r2 = r * r

        sigma = r2 + a2 * cos2
        sig_r = 2.0 * r
        sig_th = -a2 * ds2
        inv_sigma = 1.0 / sigma
        inv_sig2 = inv_sigma * inv_sigma
        delta = r2 + a2 - R * r
        del_r = 2.0 * r - R
        inv_delta = 1.0 / delta
        gamma = sin2 * R * r * a
        gam_r = sin2 * R * a
        gam_th = ds2 * R * r * a

        tt = -(1.0 - (R * r) * inv_sigma)
        tt_r = R * (sigma - r * sig_r) * inv_sig2
        tt_th = -(R * r) * sig_th * inv_sig2

        rr = sigma * inv_delta
        rr_r = (sig_r * delta - sigma * del_r) * inv_delta * inv_delta
        rr_th = sig_th * inv_delta

        hh = sigma
        hh_r = sig_r
        hh_th = sig_th

        u = gamma * a * inv_sigma  # = γ a / σ
        u_r = a * (gam_r * sigma - gamma * sig_r) * inv_sig2
        u_th = a * (gam_th * sigma - gamma * sig_th) * inv_sig2
        w = r2 + a2 + u
        pp = sin2 * w
        pp_r = sin2 * (2.0 * r + u_r)
        pp_th = ds2 * w + sin2 * u_th

        tp = -gamma * inv_sigma
        tp_r = -(gam_r * sigma - gamma * sig_r) * inv_sig2
        tp_th = -(gam_th * sigma - gamma * sig_th) * inv_sig2

        return (
            (tt, rr, hh, pp, tp),
            (tt_r, rr_r, hh_r, pp_r, tp_r),
            (tt_th, rr_th, hh_th, pp_th, tp_th),
        )

    def inner_radius(self):
        return self.M + jnp.sqrt(self.M**2 - self.a**2)

    def isco(self):
        return kerr_isco(self.M, self.a)


def SchwarzschildMetric(M=1.0):
    """Schwarzschild = Kerr with a = 0."""
    return KerrMetric(M=M, a=0.0)


def kerr_isco(M, a):
    """Bardeen-Press-Teukolsky analytic ISCO radius (prograde for a>0)."""
    x = a / M
    z1 = 1.0 + jnp.cbrt(1.0 - x * x) * (jnp.cbrt(1.0 + x) + jnp.cbrt(1.0 - x))
    z2 = jnp.sqrt(3.0 * x * x + z1 * z1)
    return M * (3.0 + z2 - jnp.sign(x + 1e-300) * jnp.sqrt((3.0 - z1) * (3.0 + z1 + 2.0 * z2)))


def convert_angles(a, r, theta, phi, theta_obs, phi_obs):
    """Map a global direction at (r, θ, φ) onto the local sky of an observer at
    (θ_obs, φ_obs) — used by disc-profile models.

    Reference: `src/metrics/kerr-metric.jl:75-87` (`convert_angles`)."""
    dphi = phi - phi_obs
    R = jnp.sqrt(r * r + a * a)
    o1 = r * R * jnp.sin(theta) * jnp.sin(theta_obs) * jnp.cos(dphi) + R * R * jnp.cos(
        theta
    ) * jnp.cos(theta_obs)
    o2 = R * jnp.cos(theta) * jnp.sin(theta_obs) * jnp.cos(dphi) - r * jnp.sin(
        theta
    ) * jnp.cos(theta_obs)
    o3 = jnp.sin(theta_obs) * jnp.sin(dphi) / jnp.sin(theta)
    sigma = r * r + a * a * jnp.cos(theta) ** 2
    return -o1 / sigma, -o2 / sigma, o3 / R
