"""Compute the CTF moment at every reference golden anchor
(test/smoke-tests/cunningham-transfer-functions.jl:25-39) and report the
deviation pattern."""

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

GOLDEN = [
    (0.998, 3.0, 4.0, 0.14048899037409682),
    (0.998, 35.0, 4.0, 0.10846177995555085),
    (0.998, 74.0, 4.0, 0.05550300700779827),
    (0.998, 85.0, 4.0, 0.03602870590038378),
    (0.998, 30.0, 4.0, 0.11958152396826184),
    (0.998, 30.0, 7.0, 0.12205125501900763),
    (0.998, 30.0, 10.0, 0.1265019201038228),
    (0.998, 30.0, 15.0, 0.12875961522283233),
]


def moment(a, angle, re):
    m = gt.KerrMetric(M=1.0, a=a)
    d = gt.ThinDisc(0.0, jnp.inf)
    x = jnp.array([0.0, 100_000.0, np.deg2rad(angle), 0.0])
    _, s = gt.cunningham_transfer_function(
        m, x, d, jnp.array([re]), N=80, return_samples=True
    )
    ok = np.asarray(s["ok"][0])
    f = np.asarray(s["f"][0])
    gs = np.asarray(s["gstar"][0])
    valid = ok & np.isfinite(f)
    return (f[valid] * gs[valid]).sum() / valid.sum(), valid.sum()


for a, ang, re, gold in GOLDEN:
    mom, n = moment(a, ang, re)
    print(
        f"a={a} i={ang:5.1f} re={re:6.1f}: ours={mom:.6f} golden={gold:.6f} "
        f"dev={(mom-gold)/gold*100:+.2f}% n={n}"
    )
