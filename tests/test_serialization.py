"""npz round-trips for precomputed artifacts (reference: persisted
`CunninghamTransferTable`s for spectral fitting + `EndpointRenderCache`
reuse, `src/rendering/cache.jl`, `src/transfer-functions/types.jl`)."""

import jax.numpy as jnp
import numpy as np
import pytest

import gradus_tpu as gt
from gradus_tpu.corona.profiles import RadialDiscProfile
from gradus_tpu.serialization import save_npz, load_npz
from gradus_tpu.transfer.cunningham import TransferBranchGrid


def _assert_trees_equal(a, b):
    import jax

    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_transfer_grid_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    grid = TransferBranchGrid(
        radii=jnp.asarray(rng.uniform(2, 50, 5)),
        gmin=jnp.asarray(rng.uniform(0.2, 0.4, 5)),
        gmax=jnp.asarray(rng.uniform(0.9, 1.2, 5)),
        gstar=jnp.linspace(0.01, 0.99, 16),
        lower_f=jnp.asarray(rng.uniform(0, 1, (5, 16))),
        upper_f=jnp.asarray(rng.uniform(0, 1, (5, 16))),
        lower_t=jnp.asarray(rng.uniform(0, 100, (5, 16))),
        upper_t=jnp.asarray(rng.uniform(0, 100, (5, 16))),
    )
    path = tmp_path / "grid.npz"
    save_npz(path, grid)
    grid2 = load_npz(path)
    assert isinstance(grid2, TransferBranchGrid)
    _assert_trees_equal(grid, grid2)


def test_radial_profile_roundtrip(tmp_path):
    prof = RadialDiscProfile(
        radii=jnp.asarray([2.0, 5.0, 10.0, jnp.inf]),
        eps=jnp.asarray([1.0, 0.1, 0.01, 0.0]),
        t=jnp.asarray([3.0, 7.0, 13.0, 0.0]),
        n=jnp.asarray(3, jnp.int32),
    )
    path = tmp_path / "prof.npz"
    save_npz(path, prof)
    prof2 = load_npz(path)
    _assert_trees_equal(prof, prof2)
    # interpolants behave identically after the round trip
    q = jnp.asarray([3.0, 6.0])
    np.testing.assert_allclose(
        np.asarray(prof.emissivity_at(q)), np.asarray(prof2.emissivity_at(q))
    )


def test_render_cache_roundtrip(tmp_path):
    """Full render cache (metric + GeodesicPoint batch payload) round-trips,
    and re-applying a point function reproduces the image without re-tracing."""
    from gradus_tpu.camera.render import apply
    from gradus_tpu.camera.pointfns import ConstPointFunctions

    m = gt.KerrMetric(M=1.0, a=0.7)
    x = jnp.array([0.0, 100.0, np.deg2rad(70.0), 0.0])
    _, _, cache = gt.prerendergeodesics(
        m,
        x,
        lam_max=300.0,
        image_width=6,
        image_height=6,
        alpha_lims=(-10.0, 10.0),
        beta_lims=(-10.0, 10.0),
    )
    path = tmp_path / "cache.npz"
    save_npz(path, cache)
    cache2 = load_npz(path)
    img = np.asarray(apply(ConstPointFunctions.shadow(), cache))
    img2 = np.asarray(apply(ConstPointFunctions.shadow(), cache2))
    np.testing.assert_array_equal(img, img2)


def test_analytic_profile_rejected(tmp_path):
    """Callables are not serializable — explicit error, not silent pickle."""
    prof = gt.AnalyticRadialDiscProfile(lambda r: r**-3.0)
    with pytest.raises(TypeError):
        save_npz(tmp_path / "bad.npz", prof)
