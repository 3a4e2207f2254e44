"""Docs stay honest: every API named in docs/ exists with the documented
shape, and the custom-metric example actually runs end-to-end."""

import re
import os

import jax.numpy as jnp
import numpy as np
import pytest

import gradus_tpu as gt

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs")


def test_documented_apis_exist():
    """Every `gt.<name>` mentioned in the docs resolves on the package."""
    names = set()
    for fn in os.listdir(DOCS):
        if not fn.endswith(".md"):
            continue
        text = open(os.path.join(DOCS, fn)).read()
        names |= set(re.findall(r"gt\.([A-Za-z_][A-Za-z0-9_]*)", text))
    missing = sorted(n for n in names if not hasattr(gt, n))
    assert not missing, missing


def test_documented_imports_resolve():
    """Every `from gradus_tpu... import ...` line in the docs imports."""
    import importlib

    pat = re.compile(r"^from (gradus_tpu[A-Za-z0-9_.]*) import (.+)$")
    for fn in os.listdir(DOCS):
        if not fn.endswith(".md"):
            continue
        for line in open(os.path.join(DOCS, fn)):
            m_ = pat.match(line.strip())
            if not m_:
                continue
            mod = importlib.import_module(m_.group(1))
            for name in m_.group(2).split(","):
                name = name.strip().rstrip(")")
                if not name or name == "(":
                    continue
                assert hasattr(mod, name), (m_.group(1), name)


@pytest.mark.slow
def test_custom_metric_example_runs():
    """The docs/custom-metrics.md example end-to-end (scaled down)."""
    from gradus_tpu.metrics.base import AbstractMetric, metric_dataclass

    @metric_dataclass
    class EddingtonFinkelsteinAD(AbstractMetric):
        M: float = 1.0

        def components5(self, r, theta):
            tt = -(1.0 - 2.0 * self.M / r)
            rr = -1.0 / tt
            hh = r * r
            pp = r * r * jnp.sin(theta) ** 2
            tp = jnp.zeros_like(r)
            return (tt, rr, hh, pp, tp)

        def components(self, r, theta):
            r, theta = jnp.broadcast_arrays(
                jnp.asarray(r, jnp.result_type(r, theta, float)), theta
            )
            return jnp.stack(self.components5(r, theta), axis=-1)

        def inner_radius(self):
            return 2.0 * self.M

    m = EddingtonFinkelsteinAD(M=1.0)
    # Schwarzschild physics drops out generically: ISCO = 6M
    np.testing.assert_allclose(float(gt.isco(m)), 6.0, rtol=1e-6)
    x = jnp.array([0.0, 1000.0, np.deg2rad(70.0), 0.0])
    bins, flux = gt.lineprofile(
        m, x, gt.ThinDisc(0.0, 50.0), num_re=8, N=16, N_extrema=6, Ng=32
    )
    flux = np.asarray(flux)
    assert np.isfinite(flux).all()
    np.testing.assert_allclose(flux.sum(), 1.0, rtol=1e-6)
