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


def test_bigtiff_roundtrip(tmp_path, rng):
    """Forced BigTIFF (magic 43, 8-byte offsets) must round-trip bit-exact."""
    r = make_raster(rng)
    path = str(tmp_path / "big.tif")
    write_geotiff_file(path, r, bigtiff=True)
    assert open(path, "rb").read(4)[2] == 43
    back = read_geotiff(path)
    np.testing.assert_allclose(np.asarray(back.data), np.asarray(r.data), rtol=1e-7)
    assert back.grid.shape == r.grid.shape
    assert np.isclose(back.grid.xmin, r.grid.xmin)


def test_streamed_write_matches_array_write(tmp_path, rng):
    """write_geotiff_stream on row blocks == write_geotiff_file on the array."""
    from machisplin_tpu.io.geotiff import write_geotiff_stream

    r = make_raster(rng, nrows=64, ncols=50)
    arr = np.asarray(r.data)
    p1 = str(tmp_path / "a.tif")
    p2 = str(tmp_path / "s.tif")
    write_geotiff_file(p1, r)
    rps = 16
    write_geotiff_stream(
        p2, r.grid, (arr[i : i + rps] for i in range(0, 64, rps)), rows_per_strip=rps
    )
    back = read_geotiff(p2)
    np.testing.assert_allclose(np.asarray(back.data), arr, rtol=1e-7)


def test_stream_row_count_mismatch_raises(tmp_path, rng):
    from machisplin_tpu.io.geotiff import write_geotiff_stream

    r = make_raster(rng, nrows=64, ncols=50)
    arr = np.asarray(r.data)
    with pytest.raises(ValueError, match="row_blocks yielded"):
        write_geotiff_stream(
            str(tmp_path / "x.tif"), r.grid,
            (arr[i : i + 16] for i in range(0, 48, 16)), rows_per_strip=16,
        )


def test_bigtiff_over_4gb_roundtrip(tmp_path):
    """A > 4 GB uncompressed surface exceeds classic-TIFF offsets; the
    streaming writer must auto-select BigTIFF and the reader must recover
    rows on both sides of the 2^32 offset boundary (VERDICT missing #6:
    config-4/5-scale outputs).  Interior all-zero strips become filesystem
    holes (sparse_ok, GDAL's SPARSE_OK analog) so the test exercises real
    >4 GB offsets without paying this container's ~20-30 MB/s disk throttle
    for 4 GB of zeros; the first and last strips carry real data."""
    from machisplin_tpu.io.geotiff import write_geotiff_stream

    # 4.303e9 bytes of float32 — just past the 2^32 offset boundary
    nrows, ncols = 33000, 32600
    g = GridSpec(nrows=nrows, ncols=ncols, xmin=0.0, ymax=1.0, dx=1e-5, dy=1e-5)
    rps = 512
    n_strips = (nrows + rps - 1) // rps
    path = str(tmp_path / "huge.tif")

    def blocks():
        for s in range(n_strips):
            r0 = s * rps
            rows = min(rps, nrows - r0)
            if s in (0, n_strips - 1):
                # row index ramp: position-dependent, verifiable
                yield np.broadcast_to(
                    np.arange(r0, r0 + rows, dtype=np.float32)[:, None], (rows, ncols)
                )
            else:
                yield np.zeros((rows, ncols), np.float32)

    write_geotiff_stream(
        path, g, blocks(), compress=False, rows_per_strip=rps, sparse_ok=True
    )
    assert os.path.getsize(path) > (1 << 32)   # logical size crosses 4 GB
    assert open(path, "rb").read(4)[2] == 43   # auto-selected BigTIFF
    back = read_geotiff(path)
    assert back.grid.shape == (nrows, ncols)
    arr = np.asarray(back.data)
    # data strips on both sides of the boundary + hole strips read as zeros
    for r0 in (0, rps - 1, nrows - 1):
        np.testing.assert_array_equal(arr[r0], np.full(ncols, r0, np.float32))
    for r0 in (rps, nrows // 2, nrows - rps - 1):
        assert not arr[r0].any()


def test_sparse_write_roundtrips_zero_strips(tmp_path, rng):
    """sparse_ok holes must be invisible to the reader (small-scale check)."""
    from machisplin_tpu.io.geotiff import write_geotiff_stream

    g = GridSpec(nrows=48, ncols=30, xmin=0.0, ymax=1.0, dx=0.01, dy=0.01)
    arr = rng.standard_normal((48, 30)).astype(np.float32)
    arr[16:32] = 0.0  # middle strip all-zero -> hole
    path = str(tmp_path / "sparse.tif")
    write_geotiff_stream(
        path, g, (arr[i : i + 16] for i in range(0, 48, 16)),
        compress=False, rows_per_strip=16, sparse_ok=True,
    )
    back = read_geotiff(path)
    np.testing.assert_array_equal(np.asarray(back.data), arr)


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


def test_rdata_reader_decodes_bundled_fixtures():
    """The native RDX2/XDR reader (io/rdata.py) must decode the reference's
    actual R serializations — data/sampling.RData and data/example.dat.Rdata
    (R/data.R:1-38) — and agree with the shipped CSV twin exactly."""
    from machisplin_tpu.data import load_example_dat, load_sampling

    csv = load_sampling()
    rdat = load_sampling(source="rdata")
    ex = load_example_dat()
    assert rdat.shape == (813,) and ex.shape == (813,)
    for name in ("long", "lat", "bio_1", "bio_12"):
        np.testing.assert_allclose(np.asarray(rdat[name], float), csv[name], atol=1e-9)
        np.testing.assert_allclose(np.asarray(ex[name], float), csv[name], atol=1e-9)


def test_rdata_reader_rejects_non_rdata(tmp_path):
    from machisplin_tpu.io.rdata import read_rdata

    p = tmp_path / "bogus.RData"
    p.write_bytes(b"not an rdata file")
    with pytest.raises(ValueError, match="RDX2"):
        read_rdata(str(p))


# ---- overview pyramids (.ovr sidecars, io/overviews.py) ---------------------


def test_overview_decimate_nan_aware():
    from machisplin_tpu.io.overviews import decimate

    a = np.array(
        [[1.0, 3.0, 5.0], [np.nan, 7.0, np.nan], [9.0, np.nan, np.nan]],
        np.float32,
    )
    out = decimate(a, 2)
    assert out.shape == (2, 2)
    # block (0,0) = mean(1, 3, 7); (0,1) edge block = mean(5); (1,0) = 9;
    # (1,1) all-NaN -> NaN
    np.testing.assert_allclose(out[0, 0], (1 + 3 + 7) / 3)
    np.testing.assert_allclose(out[0, 1], 5.0)
    np.testing.assert_allclose(out[1, 0], 9.0)
    assert np.isnan(out[1, 1])
    # multiband shape handling
    out3 = decimate(np.stack([a, a]), 2)
    assert out3.shape == (2, 2, 2)
    np.testing.assert_allclose(out3[0], out, equal_nan=True)


def test_overview_default_levels_ladder():
    from machisplin_tpu.io.overviews import default_levels

    g = GridSpec(nrows=2476, ncols=3264, xmin=0, ymax=0, dx=1.0, dy=1.0)
    assert default_levels(g, min_size=256) == [2, 4, 8]
    small = GridSpec(nrows=100, ncols=120, xmin=0, ymax=0, dx=1.0, dy=1.0)
    assert default_levels(small, min_size=256) == []


@pytest.mark.parametrize("compress", [False, True])
def test_overview_roundtrip(tmp_path, rng, compress):
    from machisplin_tpu.io.overviews import decimate, read_overview, write_overviews

    r = make_raster(rng, nrows=130, ncols=200)
    path = str(tmp_path / "s.tif")
    write_geotiff_file(path, r)
    ovr = write_overviews(path, r, min_size=32, compress=compress)
    assert ovr == path + ".ovr"
    full = np.asarray(r.data)
    want = full
    for k, f in enumerate([2, 4]):
        o = read_overview(path, k)
        want = decimate(want, 2)  # successive levels refine the previous one
        np.testing.assert_allclose(np.asarray(o.data), want, equal_nan=True)
        assert o.grid.shape == want.shape
        assert np.isclose(o.grid.dx, r.grid.dx * r.grid.ncols / want.shape[1])
        assert np.isclose(o.grid.xmin, r.grid.xmin)
        assert np.isclose(o.grid.ymax, r.grid.ymax)
    with pytest.raises(IndexError):
        read_overview(path, 5)


def test_overview_multiband_and_writer_hook(tmp_path, rng):
    from machisplin_tpu.io.overviews import read_overview

    # multiband pyramid
    g = GridSpec(nrows=96, ncols=100, xmin=-77.74, ymax=-5.81, dx=0.01, dy=0.01)
    data = rng.standard_normal((3, 96, 100)).astype(np.float32)
    r = Raster(jnp.asarray(data), g, ("a", "b", "c"))
    path = str(tmp_path / "m.tif")
    write_geotiff_file(path, r)
    from machisplin_tpu.io.overviews import decimate, write_overviews

    write_overviews(path, r, levels=[2], compress=True)
    o = read_overview(path, 0)
    np.testing.assert_allclose(np.asarray(o.data), decimate(data, 2), equal_nan=True)

    # write_geotiff(overviews=True) emits the sidecars alongside the .tif
    paths = write_geotiff(
        _fake_results(rng), str(tmp_path / "out"), seed=7, overviews=[2, 4]
    )
    ovrs = [p for p in paths if p.endswith(".ovr")]
    assert len(ovrs) == 1 and os.path.exists(ovrs[0])
