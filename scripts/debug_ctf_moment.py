"""Debug the CTF re4 moment golden (VERDICT r3 weak #1a).

Golden: measure_ctf = sum(f*gstar)/N = 0.11958152396826184 at a=0.998, i=30,
re=4 (reference test/smoke-tests/cunningham-transfer-functions.jl:31).
Round-3 head measures 0.11505 (3.8% off).

Strategy: evaluate the workhorse (g, J, t, ok) per theta with f64 + tight
tolerances, then
  (a) reproduce the repo statistic,
  (b) emulate the EXACT Optim.jl GoldenSection probe sequence used by the
      reference (single-interior-point variant, golden_ratio=(3-sqrt5)/2,
      1 init + 16 iterations per side),
  (c) compute the moment from that union, and a dense-sweep convergence check.
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
from gradus_tpu.transfer.solvers import offset_workhorse
from gradus_tpu.transfer.cunningham import _theta_samples, _avoid_poles

A, ANGLE, RE = 0.998, 30.0, 4.0
m = gt.KerrMetric(M=1.0, a=A)
d = gt.ThinDisc(0.0, jnp.inf)
x = jnp.array([0.0, 100_000.0, np.deg2rad(ANGLE), 0.0])
disc = gt.DatumPlane(0.0)

BATCH = 128  # fixed batch so everything reuses one compiled program


def eval_thetas(thetas):
    """thetas: (n,) -> g, J, t, ok arrays (n,). Pads to BATCH."""
    thetas = np.asarray(thetas, float)
    n = len(thetas)
    pad = np.full(BATCH - n % BATCH if n % BATCH else 0, np.pi / 2)
    th = np.concatenate([thetas, pad])
    gs, Js, ts, oks = [], [], [], []
    for i in range(0, len(th), BATCH):
        tb = jnp.asarray(th[i : i + BATCH])
        re = jnp.full((BATCH,), RE)
        g, J, t, ok = offset_workhorse(
            m, x, disc, re, _avoid_poles(tb), jacobian_disc=disc, lam_max=2.0 * x[1]
        )
        gs.append(np.asarray(g))
        Js.append(np.asarray(J))
        ts.append(np.asarray(t))
        oks.append(np.asarray(ok))
    g = np.concatenate(gs)[:n]
    J = np.concatenate(Js)[:n]
    t = np.concatenate(ts)[:n]
    ok = np.concatenate(oks)[:n]
    return g, J, t, ok


def optim_golden_probes(fvals_fn, lo, hi, iterations=16):
    """Emulate Optim.jl GoldenSection: returns list of probed thetas.

    golden_ratio = (3 - sqrt(5))/2 ~ 0.381966; x_min starts at
    lo + gr*(hi-lo); each iteration probes one new point on the larger side.
    fvals_fn(theta) -> objective (scalar).
    """
    gr = 0.5 * (3.0 - np.sqrt(5.0))
    xs = []
    x_min = lo + gr * (hi - lo)
    f_min = fvals_fn(x_min)
    xs.append(x_min)
    x_lower, x_upper = lo, hi
    for _ in range(iterations):
        if x_upper - x_min > x_min - x_lower:
            x_new = x_min + gr * (x_upper - x_min)
            f_new = fvals_fn(x_new)
            xs.append(x_new)
            if f_new < f_min:
                x_lower = x_min
                x_min, f_min = x_new, f_new
            else:
                x_upper = x_new
        else:
            x_new = x_min - gr * (x_min - x_lower)
            f_new = fvals_fn(x_new)
            xs.append(x_new)
            if f_new < f_min:
                x_upper = x_min
                x_min, f_min = x_new, f_new
            else:
                x_lower = x_new
    return xs


def moment_from_samples(th, g, J, ok, label):
    gmin = g[ok].min()
    gmax = g[ok].max()
    span = gmax - gmin
    gstar = (g - gmin) / span
    root = np.sqrt(np.clip(gstar * (1 - gstar), 0, None))
    f = np.where(root == 0, 0.0, (1 / (np.pi * RE)) * g * root * span * J)
    valid = ok & np.isfinite(f)
    mom = (f[valid] * gstar[valid]).sum() / valid.sum()
    print(
        f"{label}: moment={mom:.6f} n_valid={valid.sum()}/{len(th)} "
        f"gmin={gmin:.6f} gmax={gmax:.6f}"
    )
    return mom, gmin, gmax


# --- (a) repo's own statistic --------------------------------------------
_, s = gt.cunningham_transfer_function(
    m, x, d, jnp.array([RE]), N=80, return_samples=True
)
ok = np.asarray(s["ok"][0])
f = np.asarray(s["f"][0])
gsr = np.asarray(s["gstar"][0])
valid = ok & np.isfinite(f)
print(
    f"repo pipeline: moment={(f[valid]*gsr[valid]).sum()/valid.sum():.6f} "
    f"n_valid={valid.sum()}/{len(f)}"
)

# --- (b) 80-sweep with workhorse directly --------------------------------
th80 = np.asarray(_theta_samples(80, 0.3, jnp.float64))
g80, J80, t80, ok80 = eval_thetas(th80)
print(f"sweep80 ok: {ok80.sum()}/80")

# cache for golden emulation (evaluate one theta at a time, batched trick:
# collect then re-evaluate). Use a memo dict.
memo = {}


def g_of(theta):
    t = float(theta)
    # pole-avoid identical to reference _gmin_finder
    if abs(t) < 1e-4 or abs(abs(t) - np.pi) < 1e-4:
        t += 1e-4
    if t not in memo:
        gv, Jv, tv, okv = eval_thetas([t])
        memo[t] = (gv[0], Jv[0], tv[0], okv[0])
    return memo[t]


probes_min = optim_golden_probes(lambda th: g_of(th)[0], -0.3, 0.3, 16)
probes_max = optim_golden_probes(lambda th: -g_of(th)[0], np.pi - 0.3, np.pi + 0.3, 16)

th_all = np.concatenate([th80, probes_min, probes_max])
g_all = np.concatenate([g80, [g_of(t)[0] for t in probes_min], [g_of(t)[0] for t in probes_max]])
J_all = np.concatenate([J80, [g_of(t)[1] for t in probes_min], [g_of(t)[1] for t in probes_max]])
ok_all = np.concatenate([ok80, [g_of(t)[3] for t in probes_min], [g_of(t)[3] for t in probes_max]])

moment_from_samples(th_all, g_all, J_all, ok_all, "optim-emulated")

# --- (c) denser sweeps: convergence of the statistic's continuum limit ----
# NOTE the moment is distribution-dependent; this is just to see the f curve
for n in (320,):
    thd = np.asarray(_theta_samples(n, 0.3, jnp.float64))
    gd, Jd, td, okd = eval_thetas(thd)
    moment_from_samples(thd, gd, Jd, okd, f"sweep{n} (no probes)")

# dump the f(theta) curve for inspection
np.savez(
    "/tmp/ctf_debug.npz",
    th80=th80, g80=g80, J80=J80, ok80=ok80,
    th_all=th_all, g_all=g_all, J_all=J_all, ok_all=ok_all,
)
print("saved /tmp/ctf_debug.npz")
