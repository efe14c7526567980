"""GeoTIFF codec + writer tests: roundtrip fidelity, geo-referencing,
compression modes, and the reference's output file formats (V73:998-1125)."""
import os
import types

import jax.numpy as jnp
import numpy as np
import pytest

from machisplin_tpu.grid import GridSpec, Raster
from machisplin_tpu.io.geotiff import read_geotiff, write_geotiff_file
from machisplin_tpu.io.writers import write_geotiff, write_loadings, write_residuals


def make_raster(rng, nrows=33, ncols=47):
    g = GridSpec(nrows=nrows, ncols=ncols, xmin=-77.74, ymax=-5.81, dx=0.000833, dy=0.000833)
    data = rng.standard_normal((nrows, ncols)).astype(np.float32)
    data[0, 0] = np.nan
    return Raster(jnp.asarray(data), g, ("bio_1",))


@pytest.mark.parametrize("compress", [False, True])
def test_geotiff_roundtrip(tmp_path, rng, compress):
    r = make_raster(rng)
    path = str(tmp_path / "t.tif")
    write_geotiff_file(path, r, compress=compress)
    back = read_geotiff(path)
    np.testing.assert_allclose(np.asarray(back.data), np.asarray(r.data), rtol=1e-7)
    g1, g2 = r.grid, back.grid
    assert g1.shape == g2.shape
    assert np.isclose(g1.xmin, g2.xmin) and np.isclose(g1.ymax, g2.ymax)
    assert np.isclose(g1.dx, g2.dx) and np.isclose(g1.dy, g2.dy)


def test_geotiff_multiband_roundtrip(tmp_path, rng):
    g = GridSpec(nrows=20, ncols=20, xmin=0, ymax=1, dx=0.05, dy=0.05)
    data = rng.standard_normal((3, 20, 20)).astype(np.float32)
    r = Raster(jnp.asarray(data), g, ("a", "b", "c"))
    path = str(tmp_path / "mb.tif")
    write_geotiff_file(path, r)
    back = read_geotiff(path)
    np.testing.assert_allclose(np.asarray(back.data), data, rtol=1e-7)


def test_geotiff_reads_sidecar_geometry(tmp_path, rng):
    """Geometry matches the reference's alt.tfw numbers when written back."""
    g = GridSpec(nrows=2476, ncols=8, xmin=-77.7435765934, ymax=-5.8094167820,
                 dx=0.0008333333, dy=0.0008333333)
    r = Raster(jnp.zeros(g.shape, jnp.float32), g)
    path = str(tmp_path / "geo.tif")
    write_geotiff_file(path, r)
    back = read_geotiff(path)
    assert np.isclose(back.grid.xmin, -77.7435765934)
    assert np.isclose(back.grid.ymax, -5.8094167820)


def _fake_results(rng):
    r = make_raster(rng)
    res = types.SimpleNamespace(
        name="bio_1",
        final=r,
        residuals=np.stack([rng.standard_normal(5), np.arange(5.0), np.arange(5.0)], axis=1),
        var_imp={"gam": {"(Intercept)": 1.0, "alt": 0.5}, "nn": {"alt": 1.0}},
        summary={
            "layer": "bio_1", "best model(s):": "gn", "ensemble weights:": "60.0:40.0",
            "r2 ensemble:": 0.97, "r2 final:": 0.99,
        },
        n_layers=1,
    )
    return [res]


def test_write_geotiff_outputs(tmp_path, rng):
    paths = write_geotiff(_fake_results(rng), str(tmp_path), seed=42)
    tif = [p for p in paths if p.endswith(".tif")]
    csvs = [p for p in paths if "MACHISPLIN_results_" in p]
    assert len(tif) == 1 and os.path.exists(tif[0])
    assert len(csvs) == 1
    text = open(csvs[0]).read()
    assert "bio_1" in text and "60.0:40.0" in text
    assert "boosted regression trees" in text  # the 7-line legend


def test_write_residuals_and_loadings(tmp_path, rng):
    res = _fake_results(rng)
    (rpath,) = write_residuals(res, str(tmp_path))
    lines = open(rpath).read().splitlines()
    assert lines[0].split(",")[1:] == ["residuals", "long", "lat"]
    assert len(lines) == 6
    (lpath,) = write_loadings(res, str(tmp_path))
    text = open(lpath).read()
    assert "$gam" in text and "$nn" in text and "(Intercept)" in text
