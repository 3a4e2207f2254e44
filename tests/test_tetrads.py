"""Tetrad orthonormality — parity with reference
`test/unit/orthonormalization.jl:24-36` (contract with g → Minkowski at 1e-13)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gradus_tpu.geodesics import (
    tetradframe,
    lnrframe,
    lnrbasis,
    propernorm,
    constrain_all,
)
from gradus_tpu.metrics import (
    KerrMetric,
    JohannsenPsaltisMetric,
    KerrNewmanMetric,
    minkowski_matrix,
)

METRICS = [
    KerrMetric(M=1.0, a=0.0),
    KerrMetric(M=1.0, a=0.998),
    JohannsenPsaltisMetric(M=1.0, a=0.6, eps3=1.0),
    KerrNewmanMetric(M=1.0, a=0.5, Q=0.3),
]
POSITIONS = [
    jnp.array([0.0, 3.0, np.pi / 2, 0.0]),
    jnp.array([0.0, 6.0, 1.0, 0.5]),
    jnp.array([0.0, 20.0, 2.2, 1.0]),
]


def _check_orthonormal(g, frame, atol=1e-13):
    T = np.stack([np.asarray(e) for e in frame], axis=-1)
    eta = T.T @ np.asarray(g) @ T
    np.testing.assert_allclose(eta, np.asarray(minkowski_matrix()), atol=atol)


@pytest.mark.parametrize("m", METRICS, ids=lambda m: f"{type(m).__name__}")
@pytest.mark.parametrize("x", POSITIONS, ids=["r3", "r6", "r20"])
def test_tetradframe_orthonormal(m, x):
    # a timelike velocity with nonzero r and φ components
    v = jnp.array([1.0, -0.1, 0.0, 0.05])
    v = constrain_all(m, x, v, mu=1.0)
    frame = tetradframe(m, x, v)
    _check_orthonormal(m.metric(x), frame)
    # first leg is v normalized
    vhat = v / jnp.sqrt(jnp.abs(propernorm(m.metric(x), v)))
    np.testing.assert_allclose(np.asarray(frame[0]), np.asarray(vhat), atol=1e-13)


@pytest.mark.parametrize("m", METRICS, ids=lambda m: f"{type(m).__name__}")
@pytest.mark.parametrize("x", POSITIONS, ids=["r3", "r6", "r20"])
def test_lnrframe_orthonormal(m, x):
    frame = lnrframe(m, x)
    _check_orthonormal(m.metric(x), frame)


@pytest.mark.parametrize("m", METRICS, ids=lambda m: f"{type(m).__name__}")
@pytest.mark.parametrize("x", POSITIONS, ids=["r3", "r6", "r20"])
def test_lnrbasis_dual_to_frame(m, x):
    """e^{(a)}_μ e_{(b)}^μ = δ^a_b."""
    frame = lnrframe(m, x)
    basis = lnrbasis(m, x)
    F = np.stack([np.asarray(e) for e in frame], axis=-1)  # columns e_(b)
    B = np.stack([np.asarray(e) for e in basis], axis=-1)  # columns e^(a)
    np.testing.assert_allclose(B.T @ F, np.eye(4), atol=1e-13)
