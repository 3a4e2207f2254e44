"""Benchmark: rays/s on a Kerr (a=0.998) thin-disc redshift render.

Prints ONE JSON line: {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}.

Baseline anchor (BASELINE.md): the reference renders a 450×1300 = 585k-ray
thin-disc line profile in ~30 s on an 8-core M1 → ≈ 19.5k rays/s. vs_baseline
is our rays/s divided by that.

Backends (BENCH_BACKEND env):
- "pallas" (default): tile-resident Pallas TPU kernel + pilot-predicted cost
  ordering (BENCH_ORDER=pilot|block), whole render (pilot → sort → trace →
  shade → unpermute) in ONE jitted program. See PERF.md for the A/B history.
- "xla": the `lax.while_loop` + host-driven compaction path (`Tracer`).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_RAYS_PER_S = 585_000 / 30.0  # reference anchor, M1 laptop


def main():
    import jax
    import jax.numpy as jnp

    os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")
    # persistent compile cache: compiles are identical across bench runs and
    # dominate cold-start wall time over the remote-compile tunnel
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from gradus_tpu.metrics import KerrMetric
    from gradus_tpu.geometry import ThinDisc
    from gradus_tpu.integrate import Tracer, StatusCodes
    from gradus_tpu.camera.impact import map_impact_parameters
    from gradus_tpu.camera.tiling import block_permutation
    from gradus_tpu.redshift import redshift_pointfunction

    backend = os.environ.get("BENCH_BACKEND", "pallas")
    dtype = jnp.float32
    side = int(os.environ.get("BENCH_SIDE", "1024"))
    n = side * side
    lam_max = 2200.0

    m = KerrMetric(M=jnp.asarray(1.0, dtype), a=jnp.asarray(0.998, dtype))
    d = ThinDisc(inner_r=0.0, outer_r=50.0)
    x_obs = jnp.asarray([0.0, 1000.0, np.deg2rad(75.0), 0.0], dtype)

    alphas = jnp.linspace(-28.0, 28.0, side, dtype=dtype) + 1e-4
    betas = jnp.linspace(-18.0, 18.0, side, dtype=dtype) + 1e-4
    A = jnp.broadcast_to(alphas[:, None], (side, side)).ravel()
    B = jnp.broadcast_to(betas[None, :], (side, side)).ravel()

    pf = redshift_pointfunction(m, x_obs)
    v = map_impact_parameters(m, x_obs, A, B)
    xs = jnp.broadcast_to(x_obs, v.shape)

    def shade(gp):
        g = pf(m, gp, lam_max)
        hit = gp.status == StatusCodes.IntersectedWithGeometry
        return jnp.where(hit, g, jnp.nan)

    reps = int(os.environ.get("BENCH_REPS", "10"))

    if backend == "pallas":
        from gradus_tpu.integrate.pallas_solver import PallasTracer

        block = int(os.environ.get("BENCH_BLOCK", "64"))
        seg = int(os.environ.get("BENCH_SEG", "0"))
        tracer = PallasTracer(
            m,
            geometry=d,
            tile_rows=int(os.environ.get("BENCH_TILE_ROWS", "32")),
            steps_per_check=int(os.environ.get("BENCH_SPC", "8")),
            segment_iters=seg if seg > 0 else None,
            tail_bucket=int(os.environ.get("BENCH_TAIL", "16384")),
        )
        y0 = tracer._constrain(xs, v)
        order = os.environ.get("BENCH_ORDER", "pilot")

        if order == "pilot":
            # pilot-predicted cost ordering: a side/8 pilot render (~1.6% of
            # the rays) measures per-region step counts; the full-res rays are
            # sorted by the (3×3-max-pooled, conservative) predicted cost so
            # every kernel tile is cost-coherent — near-oracle per-tile early
            # exit. The pilot + sort run INSIDE the timed program.
            pilot_f = int(os.environ.get("BENCH_PILOT", "8"))
            pside = side // pilot_f
            a_p = jnp.linspace(-28.0, 28.0, pside, dtype=dtype) + 1e-4
            b_p = jnp.linspace(-18.0, 18.0, pside, dtype=dtype) + 1e-4
            A_p = jnp.broadcast_to(a_p[:, None], (pside, pside)).ravel()
            B_p = jnp.broadcast_to(b_p[None, :], (pside, pside)).ravel()
            v_p = map_impact_parameters(m, x_obs, A_p, B_p)
            y0_p = tracer._constrain(jnp.broadcast_to(x_obs, v_p.shape), v_p)
            pilot = PallasTracer(m, geometry=d, tile_rows=8)

            @jax.jit
            def render_program(y0, y0_p, tok):
                # tok chains successive renders into a dependent sequence so
                # timing cannot overlap or report before completion (the axon
                # tunnel's block_until_ready is advisory — see PERF.md)
                _, aux_p = pilot.trace(y0_p, (0.0, lam_max))
                s = aux_p["steps"].reshape(pside, pside).astype(jnp.float32)
                sp = jnp.pad(s, 1, mode="edge")
                pooled = jnp.max(
                    jnp.stack(
                        [
                            sp[i : i + pside, j : j + pside]
                            for i in range(3)
                            for j in range(3)
                        ]
                    ),
                    axis=0,
                )
                pred = jnp.repeat(jnp.repeat(pooled, pilot_f, 0), pilot_f, 1).ravel()
                perm = jnp.argsort(-pred + 0.0 * tok)
                gp, aux = tracer.trace(y0[perm], (0.0, lam_max))
                img = jnp.zeros((n,), jnp.float32).at[perm].set(shade(gp))
                return img, aux, jnp.nansum(img)

            def render(tok):
                img, aux, chk = render_program(y0, y0_p, tok)
                return img, aux, chk

        else:
            perm, inv = block_permutation(side, side, block)
            perm = jnp.asarray(perm)
            inv = jnp.asarray(inv)

            @jax.jit
            def render_program(y0, tok):
                gp, aux = tracer.trace(y0.at[0, 0].add(0.0 * tok), (0.0, lam_max))
                img = shade(gp)[inv]
                return img, aux, jnp.nansum(img)

            def render(tok):
                img, aux, chk = render_program(y0, tok)
                return img, aux, chk

    else:
        min_bucket = int(os.environ.get("BENCH_MIN_BUCKET", "2048"))
        segment_iters = int(os.environ.get("BENCH_SEGMENT_ITERS", "96"))
        tracer = Tracer(
            m, geometry=d, min_bucket=min_bucket, segment_iters=segment_iters
        )
        shade_jit = jax.jit(shade)

        def render(tok):
            gp = tracer(xs, v, (0.0, lam_max))
            img = shade_jit(gp)
            return img, None, jnp.nansum(img)

    # compile / warm up
    tok = jnp.float32(0.0)
    img, aux, chk = render(tok)
    float(jnp.asarray(chk))

    # timing protocol: each render consumes the previous render's checksum, so
    # the sequence is serially dependent; ONE scalar fetch at the end forces
    # true completion (costs one ~30 ms tunnel round trip, amortized over reps)
    t0 = time.perf_counter()
    for _ in range(reps):
        img, aux, chk = render(chk)
    float(jnp.asarray(chk))
    dt = (time.perf_counter() - t0) / reps
    if aux is not None:
        tile_iters, steps = aux["tile_iters"], aux["steps"]
        attempts, unfinished = aux["attempts"], aux["unfinished"]
    else:
        tile_iters = steps = attempts = unfinished = None

    rays_per_s = n / dt

    # observability: executed lane-steps vs useful per-ray accepted steps →
    # wasted-work fraction (VERDICT r1 weak #2 / r2 next #2)
    attempted = None
    if backend == "pallas":
        executed = int(np.asarray(jnp.sum(tile_iters)))
        useful = int(np.asarray(jnp.sum(steps)))
        attempted = int(np.asarray(jnp.sum(attempts)))
        segments = int(n // (tracer.tile_rows * 128))
    else:
        integ = tracer._integ
        executed = sum(w * it for (w, it, _) in integ.last_stats)
        useful = int(np.asarray(jnp.sum(integ.last_steps)))
        segments = len(integ.last_stats)
    details = {
        "backend": backend,
        "executed_lane_steps": executed,
        "useful_ray_steps": useful,
        "wasted_step_fraction": round(1.0 - useful / max(executed, 1), 4),
        "lane_steps_per_s": round(executed / dt, 1),
        "useful_steps_per_s": round(useful / dt, 1),
        "mean_steps_per_ray": round(useful / n, 2),
        "segments": segments,
        "seconds_per_render": round(dt, 3),
    }
    if attempted is not None:
        # attempted = lane-steps on a still-alive ray (accepted + rejected):
        # scheduling waste is dead-lane lockstep only; the rest is the
        # adaptive controller's intrinsic reject cost
        details["attempted_lane_steps"] = attempted
        details["scheduling_waste_fraction"] = round(
            1.0 - attempted / max(executed, 1), 4
        )
        details["reject_fraction"] = round(1.0 - useful / max(attempted, 1), 4)
    if unfinished is not None:
        details["unfinished_rays"] = int(np.asarray(unfinished))
    print(json.dumps({"bench_details": details}), file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"rays/s/chip, {side}x{side} Kerr a=0.998 thin-disc redshift render",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
