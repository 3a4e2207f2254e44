"""Mesh geometry (JSF) and transfer-function tables."""

import jax.numpy as jnp
import numpy as np
import pytest

import gradus_tpu as gt
from gradus_tpu.geometry import MeshAccretionGeometry, jsf_segment_triangle
from gradus_tpu.camera.impact import map_impact_parameters
from gradus_tpu.integrate import StatusCodes


def test_jsf_algorithm_basic():
    v1 = jnp.array([0.0, 0.0, 0.0])
    v2 = jnp.array([1.0, 0.0, 0.0])
    v3 = jnp.array([0.0, 1.0, 0.0])
    # segment passing through the triangle interior (front side: +z above)
    hit = jsf_segment_triangle(
        jnp.array([0.2, 0.2, 1.0]), jnp.array([0.2, 0.2, -1.0]), v1, v2, v3
    )
    miss = jsf_segment_triangle(
        jnp.array([2.0, 2.0, 1.0]), jnp.array([2.0, 2.0, -1.0]), v1, v2, v3
    )
    stop_short = jsf_segment_triangle(
        jnp.array([0.2, 0.2, 1.0]), jnp.array([0.2, 0.2, 0.5]), v1, v2, v3
    )
    assert bool(hit)
    assert not bool(miss)
    assert not bool(stop_short)


def test_mesh_render_hit():
    tri = np.array(
        [
            [[-30.0, -30.0, 0.0], [30.0, -30.0, 0.0], [30.0, 30.0, 0.0]],
            [[-30.0, -30.0, 0.0], [30.0, 30.0, 0.0], [-30.0, 30.0, 0.0]],
        ]
    )
    mesh0 = MeshAccretionGeometry.from_triangles(tri)
    mesh = MeshAccretionGeometry(
        triangles=mesh0.triangles,
        bbox_min=mesh0.bbox_min - 1,
        bbox_max=mesh0.bbox_max + 1,
        proximity2=1e8,
    )
    m = gt.SchwarzschildMetric(M=1.0)
    x = jnp.array([0.0, 100.0, np.deg2rad(60.0), 0.0])
    v = map_impact_parameters(m, x, jnp.array([9.0, 80.0]), jnp.array([0.1, 0.1]))
    xs = jnp.broadcast_to(x, v.shape)
    gp = gt.trace_geodesics(m, xs, v, (0.0, 300.0), geometry=mesh)
    st = np.asarray(gp.status)
    assert st[0] == int(StatusCodes.IntersectedWithGeometry)
    assert st[1] != int(StatusCodes.IntersectedWithGeometry)


@pytest.mark.slow
def test_transfer_table_interpolation():
    """2x2 (a, θ) lattice: querying a lattice point reproduces that grid; a
    midpoint query lies between neighbours."""
    d = gt.ThinDisc(0.0, jnp.inf)
    table = gt.make_transfer_function_table(
        gt.KerrMetric,
        d,
        [0.0, 0.5],
        [30.0, 60.0],
        r_max=50.0,
        n_radii=6,
        N=20,
        N_extrema=5,
        Ng=16,
    )
    g00 = table(0.0, 30.0)
    np.testing.assert_allclose(
        np.asarray(g00.gmin), np.asarray(table.gmin[0, 0]), rtol=1e-12
    )
    gmid = table(0.25, 45.0)
    lo = np.minimum(np.asarray(table.gmin).min(axis=(0, 1)), 1e9)
    assert np.all(np.asarray(gmid.gmin) >= np.asarray(table.gmin).min(axis=(0, 1)) - 1e-9)
    assert np.all(np.asarray(gmid.gmin) <= np.asarray(table.gmin).max(axis=(0, 1)) + 1e-9)

    # the fittable line model produces a normalized profile
    model = gt.LineProfileModel(table=table)
    energies = jnp.linspace(0.1, 1.5, 60) * 6.4
    flux = np.asarray(model(energies, a=0.25, theta_obs=45.0))
    assert np.isfinite(flux).all()
    assert flux.sum() > 0


def test_mesh_file_loaders(tmp_path):
    """OBJ and STL (binary + ASCII) ingestion round-trips the triangle soup
    (reference loads via GeometryBasics/FileIO, meshes.jl:4-30)."""
    import struct

    from gradus_tpu.geometry.meshes import MeshAccretionGeometry

    obj = "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3\nf 2/1 4/2/3 3//1\n"
    p_obj = tmp_path / "m.obj"
    p_obj.write_text(obj)
    g = MeshAccretionGeometry.from_file(p_obj)
    tris = np.asarray(g.triangles)
    assert tris.shape == (2, 3, 3)

    buf = b"\0" * 80 + struct.pack("<I", len(tris))
    for t in tris.astype(np.float32):
        buf += struct.pack("<3f", 0, 0, 1)
        for v in t:
            buf += struct.pack("<3f", *v)
        buf += struct.pack("<H", 0)
    p_stl = tmp_path / "m.stl"
    p_stl.write_bytes(buf)
    g2 = MeshAccretionGeometry.from_file(p_stl)
    np.testing.assert_allclose(np.asarray(g2.triangles), tris)

    lines = ["solid x"]
    for t in tris:
        lines += ["facet normal 0 0 1", "outer loop"]
        lines += [f"vertex {v[0]} {v[1]} {v[2]}" for v in t]
        lines += ["endloop", "endfacet"]
    lines.append("endsolid x")
    p_ascii = tmp_path / "ma.stl"
    p_ascii.write_text("\n".join(lines))
    g3 = MeshAccretionGeometry.from_stl(p_ascii)
    np.testing.assert_allclose(np.asarray(g3.triangles), tris)
