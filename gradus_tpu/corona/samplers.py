"""Local-sky direction samplers and the tetrad boost to global velocities.

Reference: `src/corona/samplers.jl`. A sampler maps index i of N to local sky
angles (θ, φ); `sky_angles_to_velocity` converts a local direction to a global
null velocity via the source's tetrad frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gradus_tpu.geodesics.tetrads import tetradframe_matrix
from gradus_tpu.metrics.base import AbstractMetric

__all__ = [
    "LowerHemisphere",
    "BothHemispheres",
    "EvenSampler",
    "WeierstrassSampler",
    "sky_angles_to_velocity",
    "cart_to_spher_jacobian",
]


class LowerHemisphere:
    pass


class BothHemispheres:
    pass


class EvenSampler:
    """Even sampling of the sky (reference samplers.jl:8-15, 43-47).

    Generators (reference `GoldenSpiralGenerator`/`EvenGenerator`/
    `RandomGenerator`, samplers.jl:4-6, 27-36):

    - ``"golden"`` (default): golden-spiral, radial = π(1+√5)·i
    - ``"even"``: radial = 2π·i/N
    - ``"random"``: the index is replaced by a uniform draw in [0, N) —
      the reference's `geti(RandomGenerator) = rand()·N`
      (corona-models.jl:137). JAX-idiomatic: pass an explicit PRNG ``key``
      (deterministic per key; defaults to key 0).
    """

    def __init__(self, domain=None, generator: str = "golden", key=None):
        self.domain = domain or LowerHemisphere()
        self.generator = generator
        self.key = key

    def _geti(self, i, N):
        if self.generator == "random":
            import jax

            key = self.key if self.key is not None else jax.random.PRNGKey(0)
            shape = jnp.shape(jnp.asarray(i))
            return jax.random.uniform(key, shape, maxval=float(N))
        return i

    def sample_angles(self, i, N):
        i = self._geti(i, N)
        if self.generator == "golden":
            radial = np.pi * (1 + np.sqrt(5.0)) * i
        else:  # "even" and "random": radial 2π·i resp. 2π·i/N mod 2π — for
            # random i both are uniform; follow the reference's even spacing
            radial = 2 * jnp.pi * (i if self.generator == "random" else i / N)
        frac = i / N
        if isinstance(self.domain, LowerHemisphere):
            elev = jnp.arccos(1.0 - frac)
        else:
            elev = jnp.arccos(1.0 - 2.0 * frac)
        return elev, jnp.mod(radial, 2 * jnp.pi)


class WeierstrassSampler:
    """Radius-biased sampling concentrating rays toward the poles
    (reference samplers.jl:16-25, 48-56). ``generator="random"`` replaces the
    index with a uniform draw in [0, N) (reference `RandomGenerator`)."""

    def __init__(self, res: float = 100.0, domain=None, generator: str = "golden", key=None):
        self.resolution = res
        self.domain = domain or LowerHemisphere()
        self.generator = generator
        self.key = key

    def sample_angles(self, i, N):
        if self.generator == "random":
            import jax

            key = self.key if self.key is not None else jax.random.PRNGKey(0)
            i = jax.random.uniform(key, jnp.shape(jnp.asarray(i)), maxval=float(N))
        radial = np.pi * (1 + np.sqrt(5.0)) * i
        phi = 2.0 * jnp.arctan(jnp.sqrt(self.resolution / i))
        if isinstance(self.domain, BothHemispheres):
            phi = jnp.where(i % 2 == 0, phi, jnp.pi - phi)
        return phi, jnp.mod(radial, 2 * jnp.pi)


def cart_to_spher_jacobian(theta, phi):
    """(reference `_cart_to_spher_jacobian`, samplers.jl:59-65)."""
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    z = jnp.zeros_like(theta)
    return jnp.stack(
        [
            jnp.stack([st * cp, st * sp, ct], axis=-1),
            jnp.stack([ct * cp, ct * sp, -st], axis=-1),
            jnp.stack([-sp, cp, z], axis=-1),
        ],
        axis=-2,
    )


def sky_angles_to_velocity(m: AbstractMetric, x, v_source, theta, phi, E0=1.0):
    """Local sky (θ, φ) → global velocity: cartesian direction → spherical
    direction at x → boost through the source tetrad
    (reference `sky_angles_to_velocity`, samplers.jl:78-97).

    theta/phi may be arrays (batched); x, v_source are single 4-vectors."""
    theta = jnp.asarray(theta)
    phi = jnp.broadcast_to(jnp.asarray(phi), theta.shape)
    # -1 for consistency with LowerHemisphere convention
    hat = -jnp.stack(
        [jnp.sin(theta) * jnp.cos(phi), jnp.sin(theta) * jnp.sin(phi), jnp.cos(theta)],
        axis=-1,
    )
    J = cart_to_spher_jacobian(x[2], x[3])
    k = jnp.einsum("ij,...j->...i", J, hat, precision=jax.lax.Precision.HIGHEST)
    p = jnp.concatenate(
        [jnp.full(theta.shape + (1,), E0, k.dtype), E0 * k], axis=-1
    )
    B = tetradframe_matrix(m, x, v_source)
    return jnp.einsum("ij,...j->...i", B, p, precision=jax.lax.Precision.HIGHEST)
