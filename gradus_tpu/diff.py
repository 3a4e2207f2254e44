"""Reverse-mode differentiation through the geodesic integrator.

The integrator is one `lax.while_loop` (adaptive trip count), which JAX can
differentiate in forward mode natively but not in reverse. The reference only
ever propagates ForwardDiff duals (every derivative in Gradus is
forward-mode: `src/tracing/precision-solvers.jl:73-131`,
`auto-diff.jl:206-211`); reverse-mode is this framework's extension for
gradient-based fitting (BASELINE gradient north-star;
`lib/GradusSpectralModels/src/GradusSpectralModels.jl:53-67` is the fitting
surface).

Design: physical fits have FEW parameters (mass, spin, deformation, disc
radii, corona height — ≲ 10 scalars) and MANY outputs (pixels, flux bins), so
the transposed-Jacobian adjoint is cheapest computed forward: `fwd_adjoint`
registers a `custom_vjp` whose forward pass evaluates the full parameter
Jacobian with `jax.jacfwd` (tangents vmapped over parameter basis vectors, so
the traces batch) and whose backward pass contracts it with the cotangent.
Exact (no checkpointing error), O(n_params) forward cost, and composes with
outer `jax.grad` / optax optimizers. For genuinely many-parameter heads
(e.g. a neural emissivity model), apply the wrapper at the few-parameter
trace boundary and let plain reverse-mode AD handle the rest of the graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["fwd_adjoint", "value_and_grad_fwd", "grad_fwd"]


def fwd_adjoint(f):
    """Make `f(params, *args)` reverse-differentiable w.r.t. `params` (any
    pytree of scalars/arrays) by supplying a custom VJP built from the
    forward-mode Jacobian.

    `jax.grad` / `jax.value_and_grad` work through the wrapped function even
    though `f` contains `lax.while_loop`s. The extra `*args` are treated as
    non-differentiable (zero cotangent). NaN Jacobian entries (miss pixels)
    are treated as zero in the contraction — pair with NaN-aware losses."""

    @jax.custom_vjp
    def g(params, *args):
        return f(params, *args)

    def g_fwd(params, *args):
        # one evaluation: jacfwd(has_aux) returns the primal as aux alongside
        # the Jacobian (out-structure outer, params-structure inner: each jac
        # leaf is shaped (out_leaf_shape..., param_leaf_shape...))
        def fun(p):
            y = f(p, *args)
            return y, y

        jac, out = jax.jacfwd(fun, has_aux=True)(params)
        return out, (jac, params, args)

    def g_bwd(res, ybar):
        jac, params, args = res
        out_leaves = [jnp.asarray(y) for y in jax.tree_util.tree_leaves(ybar)]
        param_leaves, param_treedef = jax.tree_util.tree_flatten(params)
        jac_leaves = jax.tree_util.tree_leaves(jac)
        npar = len(param_leaves)
        grads = []
        for j, pleaf in enumerate(param_leaves):
            pleaf = jnp.asarray(pleaf)
            total = jnp.zeros(pleaf.shape, pleaf.dtype)
            for i, yl in enumerate(out_leaves):
                jl = jnp.nan_to_num(jac_leaves[i * npar + j])
                axes = tuple(range(yl.ndim))
                total = total + jnp.tensordot(
                    jnp.nan_to_num(yl), jl, axes=(axes, axes)
                ).reshape(pleaf.shape).astype(pleaf.dtype)
            grads.append(total)
        grad_tree = jax.tree_util.tree_unflatten(param_treedef, grads)
        arg_cts = tuple(
            jax.tree_util.tree_map(lambda a: jnp.zeros_like(jnp.asarray(a)), a)
            for a in args
        )
        return (grad_tree,) + arg_cts

    g.defvjp(g_fwd, g_bwd)
    return g


def value_and_grad_fwd(f):
    """`jax.value_and_grad` built directly on the forward Jacobian for a
    SCALAR-valued `f(params, *args)` — one `jax.jacfwd` call, no custom_vjp
    machinery."""

    def vg(params, *args):
        val = f(params, *args)
        grad = jax.jacfwd(lambda p: f(p, *args))(params)
        return val, grad

    return vg


def grad_fwd(f):
    """`jax.grad` analogue of `value_and_grad_fwd`."""

    def g(params, *args):
        return jax.jacfwd(lambda p: f(p, *args))(params)

    return g
