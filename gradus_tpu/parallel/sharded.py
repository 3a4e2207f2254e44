"""shard_map'd tracing and rendering over a device mesh.

Rays never interact, so the trace shards trivially: each device integrates its
pixel tile to completion (the masked while_loop runs device-locally, no halo
exchange), and collectives appear only when reducing — image assembly is a
pure gather (out_specs sharded), histogram/flux binning and parameter
gradients `psum` over ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from gradus_tpu.integrate.tracing import trace_geodesics
from gradus_tpu.parallel.mesh import ray_mesh

__all__ = ["sharded_trace", "sharded_render", "pad_to_multiple"]


def pad_to_multiple(arr, k, axis=0):
    """Pad axis length up to a multiple of k (repeating the last element so
    padded rays integrate something harmless)."""
    n = arr.shape[axis]
    rem = (-n) % k
    if rem == 0:
        return arr, n
    pad = jnp.repeat(jnp.take(arr, jnp.array([n - 1]), axis=axis), rem, axis=axis)
    return jnp.concatenate([arr, pad], axis=axis), n


def sharded_trace(m, x, v, lam_span, mesh=None, **trace_kwargs):
    """Batched trace with the ray axis sharded over the mesh. Returns the
    GeodesicPoint batch (sharded along rays)."""
    if mesh is None:
        mesh = ray_mesh()
    ndev = mesh.devices.size
    x = jnp.atleast_2d(jnp.asarray(x))
    v = jnp.atleast_2d(jnp.asarray(v))
    x, v = jnp.broadcast_arrays(x, v)
    xp, n = pad_to_multiple(x, ndev)
    vp, _ = pad_to_multiple(v, ndev)

    def local_trace(x_loc, v_loc):
        return trace_geodesics(m, x_loc, v_loc, lam_span, **trace_kwargs)

    traced = jax.shard_map(
        local_trace,
        mesh=mesh,
        in_specs=(P("rays"), P("rays")),
        out_specs=P("rays"),
        # the integrator's while_loop carry mixes replicated constants with
        # ray-varying state; skip the varying-manual-axes typecheck
        check_vma=False,
    )(xp, vp)
    return jax.tree_util.tree_map(lambda a: a[:n], traced)


def sharded_render(
    m,
    position,
    geometry=None,
    lam_max: float = 2000.0,
    *,
    image_width: int = 1024,
    image_height: int = 1024,
    alpha_lims=(-60.0, 60.0),
    beta_lims=(-40.0, 40.0),
    pf=None,
    mesh=None,
    **trace_kwargs,
):
    """Distributed `rendergeodesics`: pixel tiles sharded across the mesh."""
    from gradus_tpu.camera.render import _pixel_velocities, EndpointRenderCache, apply
    from gradus_tpu.camera.pointfns import ConstPointFunctions

    if mesh is None:
        mesh = ray_mesh()
    x = jnp.asarray(position)
    alphas, betas, v = _pixel_velocities(
        m, x, image_width, image_height, alpha_lims, beta_lims
    )
    xs = jnp.broadcast_to(x, v.shape)
    gps = sharded_trace(
        m, xs, v, (0.0, lam_max), mesh=mesh, geometry=geometry, **trace_kwargs
    )
    cache = EndpointRenderCache(
        m=m,
        max_time=jnp.asarray(lam_max, x.dtype),
        height=image_height,
        width=image_width,
        points=gps,
    )
    if pf is None:
        pf = ConstPointFunctions.shadow()
    return alphas, betas, apply(pf, cache)
