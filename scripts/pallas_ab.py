"""A/B harness: PallasTracer vs XLA Tracer on the flagship bench config.

Usage: python scripts/pallas_ab.py [side] [tile_rows] [steps_per_check]
Prints agreement stats + timings. VERDICT r2 next-step #1.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from gradus_tpu.metrics import KerrMetric
from gradus_tpu.geometry import ThinDisc
from gradus_tpu.integrate import Tracer, StatusCodes
from gradus_tpu.integrate.pallas_solver import PallasTracer
from gradus_tpu.camera.impact import map_impact_parameters
from gradus_tpu.redshift import redshift_pointfunction


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    tile_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spc = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    dtype = jnp.float32
    n = side * side
    lam_max = 2200.0

    m = KerrMetric(M=jnp.asarray(1.0, dtype), a=jnp.asarray(0.998, dtype))
    d = ThinDisc(inner_r=0.0, outer_r=50.0)
    x_obs = jnp.asarray([0.0, 1000.0, np.deg2rad(75.0), 0.0], dtype)

    alphas = jnp.linspace(-28.0, 28.0, side, dtype=dtype) + 1e-4
    betas = jnp.linspace(-18.0, 18.0, side, dtype=dtype) + 1e-4
    A = jnp.broadcast_to(alphas[:, None], (side, side)).ravel()
    B = jnp.broadcast_to(betas[None, :], (side, side)).ravel()

    v = map_impact_parameters(m, x_obs, A, B)
    xs = jnp.broadcast_to(x_obs, v.shape)
    pf = redshift_pointfunction(m, x_obs)

    @jax.jit
    def shade(gp):
        g = pf(m, gp, lam_max)
        hit = gp.status == StatusCodes.IntersectedWithGeometry
        return jnp.where(hit, g, jnp.nan)

    ptr = PallasTracer(
        m, geometry=d, tile_rows=tile_rows, steps_per_check=spc
    )

    # spatially-coherent tile assignment: permute rays so each kernel tile
    # (tile_rows*128 rays) is a bh x bw pixel block instead of a raster strip
    block = os.environ.get("AB_BLOCK", "")
    if block:
        bh, bw = (int(s) for s in block.split("x"))
        assert side % bh == 0 and side % bw == 0
        perm = (
            np.arange(n)
            .reshape(side // bh, bh, side // bw, bw)
            .transpose(0, 2, 1, 3)
            .ravel()
        )
        inv = np.empty(n, np.int64)
        inv[perm] = np.arange(n)
        perm = jnp.asarray(perm)
        inv = jnp.asarray(inv)
        xs_t, v_t = xs[perm], v[perm]
    else:
        inv = None
        xs_t, v_t = xs, v

    def run_pallas():
        gp = ptr(xs_t, v_t, (0.0, lam_max))
        img = shade(gp)
        if inv is not None:
            img = img[inv]
            gp = jax.tree_util.tree_map(
                lambda a: a[inv] if hasattr(a, "shape") and a.shape[:1] == (n,) else a,
                gp,
            )
        return gp, img

    t0 = time.perf_counter()
    gp_p, img_p = run_pallas()
    jax.block_until_ready(img_p)
    t_compile = time.perf_counter() - t0
    print(f"pallas compile+first run: {t_compile:.1f}s")

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        gp_p, img_p = run_pallas()
    jax.block_until_ready(img_p)
    dt_p = (time.perf_counter() - t0) / reps
    print(f"pallas: {dt_p:.3f}s/render = {n/dt_p:,.0f} rays/s")

    # XLA reference
    tracer = Tracer(m, geometry=d, min_bucket=2048, segment_iters=96)
    gp_x = tracer(xs, v, (0.0, lam_max))
    img_x = shade(gp_x)
    jax.block_until_ready(img_x)
    t0 = time.perf_counter()
    for _ in range(reps):
        gp_x = tracer(xs, v, (0.0, lam_max))
        img_x = shade(gp_x)
    jax.block_until_ready(img_x)
    dt_x = (time.perf_counter() - t0) / reps
    print(f"xla:    {dt_x:.3f}s/render = {n/dt_x:,.0f} rays/s")
    print(f"speedup pallas/xla: {dt_x/dt_p:.2f}x")

    a = np.asarray(img_p)
    b = np.asarray(img_x)
    both = np.isfinite(a) & np.isfinite(b)
    agree_mask = (np.isfinite(a) == np.isfinite(b)).mean()
    if both.any():
        diff = np.abs(a[both] - b[both]) / np.maximum(np.abs(b[both]), 1e-6)
        print(
            f"mask agreement: {agree_mask:.5f}; rel g diff median "
            f"{np.median(diff):.2e} p99 {np.percentile(diff, 99):.2e} "
            f"max {diff.max():.2e}"
        )
    st_p = np.asarray(gp_p.status)
    st_x = np.asarray(gp_x.status)
    print(f"status agreement: {(st_p == st_x).mean():.5f}")


if __name__ == "__main__":
    main()
