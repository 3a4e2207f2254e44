"""Independent high-precision CTF moment (VERDICT r4 next #2).

Ground-truths the disputed raw-sample moment anchors Σ(f·g✶)/N at
(a = 0.998; i = 3°, 30°, 35°; rₑ = 4) — and a well-conditioned control —
through a pipeline that shares NO derivative pathway with the production CTF
(the VERDICT's "dense FD-Jacobian f64 sweep at 10× tolerance" variant):

- geodesics: the production 2nd-order tracer at abstol = reltol = 1e-11
  (100× tighter than the 1e-9 production CTF), f64;
- offset solve: host-driven safeguarded FD Newton on ρ(r_off; θ) = rₑ to
  |ρ−rₑ| ≤ 1e-9 — none of the production lockstep/warm-start/stall logic;
- redshift: closed form g = 1/(uᵗ − λuᶲ), λ = p_φ/(−p_t) analytic in the
  impact parameters (no integration);
- Jacobian: |∂(α,β)/∂(ρ,g)| with ∂g/∂(α,β) EXACT (jvp through closed forms
  only) and ∂ρ/∂(α,β) by Richardson-extrapolated central differences (two
  step sizes, h and h/2, with the h-vs-h/2 gap recorded per sample) — NOT
  the production jvp-through-the-integrator pathway;
- extremal search + θ iterator: the reference's own accumulator semantics
  (edge-clustered N = 80 sweep + 2×(15+2) golden-section probes), driven by
  the ground-truth g;
- NO near-extremal regularisation gate: with an accurate J the raw f is
  evaluated as-is (the exact argmin/argmax samples get f ≡ 0 via the IEEE
  x/x = 1 identity, as in the reference accumulator).

Why not the first-order Carter integrator for the ρ-map: the Mino-time
second-order form does not enforce the p_r² = R(r) invariant, and from
r_obs = 1e5 the accumulated drift is catastrophic (rays targeted at the disc
escape; see cross_validate_fo below, which instead links the Carter
formulation into the evidence chain at r_obs = 1e3 where it is healthy —
there the two integrators' (ρ, J) maps agree, tying the AD-tracer map used
here to the independent Carter equations).

Run:  env PYTHONPATH=/root/repo python scripts/groundtruth_ctf_moment.py [--fast]
Writes per-anchor sample dumps + moments to /root/repo/scripts/groundtruth_ctf.npz
"""

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from gradus_tpu.metrics.kerr import KerrMetric
from gradus_tpu.metrics.kerr_first_order import (
    KerrSpacetimeFirstOrder,
    trace_geodesics_first_order,
)
from gradus_tpu.integrate.tracing import trace_geodesics
from gradus_tpu.geometry.discs import DatumPlane
from gradus_tpu.camera.impact import map_impact_parameters
from gradus_tpu.geodesics.equation import constrain_all
from gradus_tpu.integrate.status import StatusCodes
from gradus_tpu.transfer.cunningham import _theta_samples, _avoid_poles
from gradus_tpu.transfer.solvers import rtheta_to_alphabeta, _conserved_g_helpers
from gradus_tpu.utils.linalg import equatorial_project

TOL = 1e-11
GR = 0.6180339887498949


class GroundTruth:
    def __init__(self, a, inc_deg, tol=TOL, r_obs=100_000.0, use_fo=False):
        self.m = (
            KerrSpacetimeFirstOrder(M=1.0, a=a) if use_fo else KerrMetric(M=1.0, a=a)
        )
        self.use_fo = use_fo
        self.r_obs = float(r_obs)
        self.x = jnp.asarray([0.0, self.r_obs, np.deg2rad(inc_deg), 0.0])
        self.lam_max = 2.0 * self.r_obs
        self.disc = DatumPlane(jnp.asarray(0.0))
        self.tol = tol
        self._lam_of, self._g_c = _conserved_g_helpers(self.m)
        self._rho_jit = jax.jit(self._rho_impl)
        self.n_traces = 0

    # -- primitives ---------------------------------------------------------
    def _rho_impl(self, al, be):
        v = map_impact_parameters(self.m, self.x, al, be)
        xs = jnp.broadcast_to(self.x, v.shape)
        if self.use_fo:
            gp = trace_geodesics_first_order(
                self.m,
                xs,
                v,
                (0.0, self.lam_max),
                geometry=self.disc,
                abstol=self.tol,
                reltol=self.tol,
                chart_outer=2.0 * self.r_obs,
                max_steps=400_000,
            )
        else:
            gp = trace_geodesics(
                self.m,
                xs,
                v,
                (0.0, self.lam_max),
                geometry=self.disc,
                abstol=self.tol,
                reltol=self.tol,
                chart_outer=2.0 * self.r_obs,
                max_steps=400_000,
            )
        rho = equatorial_project(gp.x)
        hit = gp.status == StatusCodes.IntersectedWithGeometry
        return rho, hit

    def rho(self, al, be):
        self.n_traces += np.shape(al)[0] if np.ndim(al) else 1
        return self._rho_jit(jnp.asarray(al), jnp.asarray(be))

    def lam_of_ab(self, al, be):
        """Conserved λ = p_φ/(−p_t): closed form, no integration."""
        v = map_impact_parameters(self.m, self.x, al, be)
        xs = jnp.broadcast_to(self.x, v.shape)
        v = constrain_all(self.m, xs, v, mu=0.0)
        p0 = jnp.einsum(
            "...ij,...j->...i",
            self.m.metric(xs),
            v,
            precision=jax.lax.Precision.HIGHEST,
        )
        return p0[..., 3] / (-p0[..., 0])

    def g_at(self, al, be, r_disc):
        return self._g_c(self.lam_of_ab(al, be), jnp.asarray(r_disc))

    # -- offset solve -------------------------------------------------------
    def solve(self, r_targets, thetas, r_init=None, iters=90, atol=1e-9):
        """Lockstep safeguarded FD Newton: ρ(r_off, θ) = rₑ."""
        r_targets = np.asarray(r_targets, np.float64)
        thetas = np.asarray(thetas, np.float64)
        n = r_targets.shape[0]
        r = (
            np.asarray(r_init, np.float64).copy()
            if r_init is not None
            else np.maximum(20.0, r_targets.copy())
        )
        lo = np.zeros(n)
        hi = np.full(n, np.inf)
        have_hi = np.zeros(n, bool)
        best_r = r.copy()
        best_y = np.full(n, np.inf)
        upper = 4.0 * (r_targets + 20.0)
        for _ in range(iters):
            h = 3e-6 * (1.0 + r)
            al, be = rtheta_to_alphabeta(
                jnp.asarray(np.concatenate([r, r + h])),
                jnp.asarray(np.concatenate([thetas, thetas])),
            )
            rho2, _ = self.rho(al, be)
            rho2 = np.asarray(rho2)
            y = rho2[:n] - r_targets
            slope = (rho2[n:] - rho2[:n]) / h
            imp = np.abs(y) < best_y
            best_r[imp] = r[imp]
            best_y[imp] = np.abs(y)[imp]
            if best_y.max() < atol:
                break
            lo = np.where(y < 0, np.maximum(lo, r), lo)
            hi = np.where(y > 0, np.minimum(hi, r), hi)
            have_hi |= y > 0
            slope_safe = np.where(np.abs(slope) < 1e-20, 1.0, slope)
            newton = r - y / slope_safe
            bad = (
                ~np.isfinite(newton)
                | (np.abs(slope) > 1e4)
                | (slope < 0)
                | (newton <= lo)
                | (have_hi & (newton >= hi))
                | (newton > upper)
            )
            fallback = np.where(have_hi, 0.5 * (lo + hi), np.minimum(2 * r, upper))
            r = np.where(np.abs(y) < atol, r, np.where(bad, fallback, newton))
        return best_r, best_y

    # -- Jacobian -----------------------------------------------------------
    def jacobian(self, r_off, thetas, h_ab=2e-4):
        """J = 1/|det ∂(ρ,g)/∂(α,β)| at the solved offsets.

        ∂ρ: Richardson central FD (h, h/2 → 4th order) through the Carter
        integrator. ∂g: exact closed-form jvps (g = g_c(λ(α,β), ρ(α,β))).
        Returns (J, J_plain_h, rel_fd_gap)."""
        r_off = np.asarray(r_off)
        thetas = np.asarray(thetas)
        al, be = rtheta_to_alphabeta(jnp.asarray(r_off), jnp.asarray(thetas))
        al = np.asarray(al)
        be = np.asarray(be)
        n = al.shape[0]
        h = h_ab * (1.0 + np.abs(r_off))

        def drho(hvec):
            als = np.concatenate([al + hvec, al - hvec, al, al])
            bes = np.concatenate([be, be, be + hvec, be - hvec])
            rho4, _ = self.rho(als, bes)
            rho4 = np.asarray(rho4)
            da = (rho4[:n] - rho4[n : 2 * n]) / (2 * hvec)
            db = (rho4[2 * n : 3 * n] - rho4[3 * n :]) / (2 * hvec)
            return da, db

        da1, db1 = drho(h)
        da2, db2 = drho(h / 2)
        # Richardson: (4·D(h/2) − D(h))/3 kills the O(h²) term
        drho_da = (4 * da2 - da1) / 3.0
        drho_db = (4 * db2 - db1) / 3.0
        fd_gap = np.maximum(
            np.abs(da2 - da1) / np.maximum(np.abs(drho_da), 1e-30),
            np.abs(db2 - db1) / np.maximum(np.abs(drho_db), 1e-30),
        )

        rho_c, _ = self.rho(al, be)
        rho_c = jnp.asarray(rho_c)
        alj = jnp.asarray(al)
        bej = jnp.asarray(be)
        ones = jnp.ones_like(alj)
        lam_c, dlam_da = jax.jvp(lambda a_: self.lam_of_ab(a_, bej), (alj,), (ones,))
        _, dlam_db = jax.jvp(lambda b_: self.lam_of_ab(alj, b_), (bej,), (ones,))
        _, dg_dlam = jax.jvp(
            lambda l_: self._g_c(l_, rho_c), (lam_c,), (jnp.ones_like(lam_c),)
        )
        _, dg_drho = jax.jvp(
            lambda r_: self._g_c(lam_c, r_), (rho_c,), (jnp.ones_like(rho_c),)
        )
        dg_dlam = np.asarray(dg_dlam)
        dg_drho = np.asarray(dg_drho)
        dlam_da = np.asarray(dlam_da)
        dlam_db = np.asarray(dlam_db)
        dg_da = dg_dlam * dlam_da + dg_drho * drho_da
        dg_db = dg_dlam * dlam_db + dg_drho * drho_db
        det = drho_da * dg_db - drho_db * dg_da
        J = np.abs(1.0 / det)
        det1 = da1 * (dg_dlam * dlam_db + dg_drho * db1) - db1 * (
            dg_dlam * dlam_da + dg_drho * da1
        )
        return J, np.abs(1.0 / det1), fd_gap


def golden_probes(gt, re, theta_offset=0.3, n_extrema=15, warm=None):
    """Both extremal golden-section searches, ground-truth driven.

    Returns (thetas, r_offs, gs) arrays of all 2·(n_extrema+2) probes."""
    center = np.array([0.0, np.pi])
    sign = np.array([1.0, -1.0])  # min side maximizes -g? fc = sign*g, pick smaller
    a = center - theta_offset
    b = center + theta_offset
    c = b - GR * (b - a)
    e = a + GR * (b - a)
    warm = np.array([20.0, 20.0]) if warm is None else warm.copy()

    def probe(theta2, warm2):
        th = _avoid_poles(jnp.asarray(theta2))
        r_off, resid = gt.solve(np.full(2, re), np.asarray(th), r_init=warm2)
        al, be = rtheta_to_alphabeta(jnp.asarray(r_off), th)
        g = np.asarray(gt.g_at(al, be, np.full(2, re)))
        return r_off, g, resid

    ths, rs, gs = [], [], []
    rc, gc, _ = probe(c, warm)
    warm = np.where(np.isfinite(rc), rc, warm)
    re_, ge, _ = probe(e, warm)
    warm = np.where(np.isfinite(re_), re_, warm)
    ths += [c.copy(), e.copy()]
    rs += [rc, re_]
    gs += [gc, ge]
    fc = sign * gc
    fe = sign * ge
    for _ in range(n_extrema):
        left = fc < fe
        a2 = np.where(left, a, c)
        b2 = np.where(left, e, b)
        c2 = np.where(left, b2 - GR * (b2 - a2), e)
        e2 = np.where(left, c, a2 + GR * (b2 - a2))
        pth = np.where(left, c2, e2)
        rp, gp, _ = probe(pth, warm)
        warm = np.where(np.isfinite(rp), rp, warm)
        fp = sign * gp
        fc, fe = np.where(left, fp, fe), np.where(left, fc, fp)
        a, b, c, e = a2, b2, c2, e2
        ths.append(pth.copy())
        rs.append(rp)
        gs.append(gp)
    return (
        np.concatenate([t for t in ths]),
        np.concatenate(rs),
        np.concatenate(gs),
    )


def anchor_moment(a, inc_deg, re, N=80, n_extrema=15, h_ab=2e-4, tol=TOL):
    t0 = time.time()
    gt = GroundTruth(a, inc_deg, tol=tol)
    thetas0 = np.asarray(_theta_samples(N, 0.3, jnp.float64))

    # flat-space ellipse warm start (same as production)
    inc = float(gt.x[2])
    cos_i = np.cos(inc)
    sin2 = np.sin(thetas0) ** 2
    ellipse = re * abs(cos_i) / np.sqrt(cos_i**2 * (1 - sin2) + sin2)
    r_init = ellipse + 1.0 + np.sin(inc) * np.maximum(np.sin(thetas0), 0.0)

    th_sweep = np.asarray(_avoid_poles(jnp.asarray(thetas0)))
    r_sweep, resid = gt.solve(np.full(N, re), th_sweep, r_init=r_init)
    # ρ-map noise at tol 1e-10 floors the FD Newton around 1e-8..1e-7;
    # utterly negligible against the 2-13% anchor dispute
    assert resid.max() < 5e-7, f"sweep unconverged: {resid.max()}"

    i0 = int(np.argmin(np.abs(thetas0)))
    ipi = int(np.argmin(np.abs(thetas0 - np.pi)))
    warm = np.array([r_sweep[i0], r_sweep[ipi]])
    th_p, r_p, g_p = golden_probes(gt, re, n_extrema=n_extrema, warm=warm)

    th_all = np.concatenate([th_sweep, np.asarray(_avoid_poles(jnp.asarray(th_p)))])
    r_all = np.concatenate([r_sweep, r_p])

    al, be = rtheta_to_alphabeta(jnp.asarray(r_all), jnp.asarray(th_all))
    g_all = np.asarray(gt.g_at(al, be, np.full(th_all.shape, re)))
    J_all, J_plain, fd_gap = gt.jacobian(r_all, th_all, h_ab=h_ab)

    gmin = g_all.min()
    gmax = g_all.max()
    span = gmax - gmin
    gstar = (g_all - gmin) / span
    root = np.sqrt(np.clip(gstar * (1 - gstar), 0, None))
    f = np.where(root == 0.0, 0.0, (1.0 / (np.pi * re)) * g_all * root * span * J_all)
    f_plain = np.where(
        root == 0.0, 0.0, (1.0 / (np.pi * re)) * g_all * root * span * J_plain
    )
    moment = (f * gstar).sum() / f.shape[0]
    moment_plain = (f_plain * gstar).sum() / f.shape[0]
    dt = time.time() - t0
    return dict(
        a=a,
        inc=inc_deg,
        re=re,
        moment=moment,
        moment_plain_h=moment_plain,
        gmin=gmin,
        gmax=gmax,
        theta=th_all,
        r_off=r_all,
        g=g_all,
        J=J_all,
        fd_gap=fd_gap,
        f=f,
        n_traces=gt.n_traces,
        seconds=dt,
    )


def cross_validate_fo(a=0.998, inc_deg=74.0, re=4.0):
    """Link the independent Carter formulation into the evidence chain: at
    r_obs = 1e3 (where the Mino-form FO integrator is healthy) the AD-tracer
    and Carter-integrator (ρ, J) maps must agree. Returns max rel diffs."""
    gt_ad = GroundTruth(a, inc_deg, tol=1e-11, r_obs=1000.0, use_fo=False)
    gt_fo = GroundTruth(a, inc_deg, tol=1e-12, r_obs=1000.0, use_fo=True)
    thetas = np.asarray([0.31, 1.2, 2.3, 3.43, 4.5, 5.9])
    n = thetas.shape[0]
    r_ad, resid_ad = gt_ad.solve(np.full(n, re), thetas)
    r_fo, resid_fo = gt_fo.solve(np.full(n, re), thetas)
    # the FO map's own ρ noise floor is ~1e-6 at tol 1e-12 (Mino-form
    # invariant drift) — it validates the AD map at the 1e-4 level, far
    # below the 2-13% anchor dispute, not at the AD map's 1e-11
    assert resid_ad.max() < 1e-8 and resid_fo.max() < 1e-5
    J_ad, _, _ = gt_ad.jacobian(r_ad, thetas)
    J_fo, _, _ = gt_fo.jacobian(r_fo, thetas)
    droff = np.abs(r_fo - r_ad) / np.abs(r_ad)
    dJ = np.abs(J_fo - J_ad) / np.abs(J_ad)
    return droff.max(), dJ.max()


if __name__ == "__main__":
    fast = "--fast" in sys.argv
    anchors = [
        (0.998, 74.0, 4.0),  # control: production & reference agree here
        (0.998, 35.0, 4.0),
        (0.998, 30.0, 4.0),
        (0.998, 3.0, 4.0),
    ]
    if fast:
        anchors = anchors[:2]
    out = {}
    dr_max, dj_max = cross_validate_fo()
    print(f"[fo-cross-validation @ r_obs=1e3] max rel dr_off={dr_max:.2e} dJ={dj_max:.2e}", flush=True)
    out["fo_crossval_droff"] = dr_max
    out["fo_crossval_dJ"] = dj_max
    for a, inc, re in anchors:
        res = anchor_moment(a, inc, re)
        key = f"i{inc:g}_re{re:g}"
        for k, v in res.items():
            out[f"{key}_{k}"] = v
        print(
            f"[{key}] moment={res['moment']:.8f} (plain-h {res['moment_plain_h']:.8f}) "
            f"gmin={res['gmin']:.6f} gmax={res['gmax']:.6f} "
            f"fd_gap max={res['fd_gap'].max():.2e} traces={res['n_traces']} "
            f"({res['seconds']:.0f}s)",
            flush=True,
        )
    np.savez("/root/repo/scripts/groundtruth_ctf.npz", **out)
    print("saved scripts/groundtruth_ctf.npz")
