"""Pathological-parameter regression corpus (reference
`test/transfer-functions/test-problem-cases.jl` + the problematic configs in
`test/smoke-tests/cunningham-transfer-functions.jl:42-50`): historically
failing CTF configurations must produce finite, ordered transfer functions
without erroring. Near-edge-on observers (88°), retrograde and extremal spins,
emission radii from 1.01 to ~950 r_g."""

import jax.numpy as jnp
import numpy as np
import pytest

import gradus_tpu as gt


def _ctf(a, r_obs, th_deg, r_target, **kwargs):
    m = gt.KerrMetric(M=1.0, a=a)
    d = gt.ThinDisc(0.0, jnp.inf)
    x = jnp.array([0.0, r_obs, np.deg2rad(th_deg), 0.0])
    return gt.cunningham_transfer_function(
        m, x, d, jnp.array([r_target]), N=20, N_extrema=5, Ng=16, **kwargs
    )


def _assert_sane(grid):
    gmin = float(grid.gmin[0])
    gmax = float(grid.gmax[0])
    assert np.isfinite(gmin) and np.isfinite(gmax)
    assert 0.0 < gmin < gmax < 2.0
    f = np.concatenate([np.asarray(grid.lower_f[0]), np.asarray(grid.upper_f[0])])
    assert np.isfinite(f[np.isfinite(f)]).any()
    assert np.nanmax(np.abs(np.where(np.isfinite(f), f, 0.0))) < 1e4


# fast-tier representative of the pathological corpus (near observer keeps it
# cheap); the historical r_obs=1e5 cases are all slow-tier
def test_problem_case_fast_representative():
    """a=0.998, i=88°, rₑ just outside the extremal ISCO, r_obs=1000."""
    _assert_sane(_ctf(0.998, 1000.0, 88.0, 1.2469706551751847))


@pytest.mark.slow
def test_problem_case_edge_on_extremal_spin_small_radius():
    """a=0.998, i=88°, rₑ=1.247 — emission just outside the extremal ISCO."""
    _assert_sane(_ctf(0.998, 100_000.0, 88.0, 1.2469706551751847))


PROBLEM_CASES = [
    (0.10324137931034483, 82.06896551724138, 21.755193176415617),
    (0.0, 88.0, 264.549754423346),
    (0.998, 88.0, 1.2369706551751847),
    (0.034413793103448276, 88.0, 396.93135746662),
    (0.034413793103448276, 88.0, 377.0698611),
    (0.9291724137931034, 88.0, 2.1204839212537308),
    # smoke-test corpus: retrograde spins at 88°, extreme radii
    (-0.6, 88.0, 784.8253509875607),
    (-0.998, 88.0, 953.9915665264327),
    (0.0, 88.0, 631.1007589946363),
    (0.744, 88.0, 3.1880132176627862),
    (1.0, 88.0, 1.01),
]


@pytest.mark.slow
@pytest.mark.parametrize("a,th,re", PROBLEM_CASES)
def test_problem_cases_corpus(a, th, re):
    _assert_sane(_ctf(a, 100_000.0, th, re))
