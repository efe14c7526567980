"""Grid substrate tests: cell math, crop/extend/mosaic/extract parity with the
terra operations the reference relies on (V73:123-164, 699-747)."""
import jax.numpy as jnp
import numpy as np
import pytest

from machisplin_tpu.grid import (
    GridSpec,
    Raster,
    crop,
    extend,
    extract,
    lonlat_rasters,
    mosaic,
    resample_near,
    stack,
)


def make_grid(nrows=20, ncols=30, xmin=-77.0, ymax=-5.0, d=0.1):
    return GridSpec(nrows=nrows, ncols=ncols, xmin=xmin, ymax=ymax, dx=d, dy=d)


def test_coords_roundtrip():
    g = make_grid()
    xs = np.asarray(g.x_coords())
    ys = np.asarray(g.y_coords())
    assert xs.shape == (30,) and ys.shape == (20,)
    assert np.isclose(xs[0], g.xmin + g.dx / 2)
    assert np.isclose(ys[0], g.ymax - g.dy / 2)
    # cell containing its own center is itself
    row, col = g.rowcol_from_xy(xs[7], ys[3])
    assert int(col) == 7 and int(row) == 3


def test_extent():
    g = make_grid()
    xmin, xmax, ymin, ymax = g.extent
    assert np.isclose(xmax - xmin, 30 * 0.1)
    assert np.isclose(ymax - ymin, 20 * 0.1)


def test_lonlat_rasters():
    g = make_grid()
    ll = lonlat_rasters(g)
    assert ll.names == ("LONG", "LAT")
    assert np.allclose(np.asarray(ll.data[0][0, :]), np.asarray(g.x_coords()))
    assert np.allclose(np.asarray(ll.data[1][:, 0]), np.asarray(g.y_coords()))


def test_crop_snap_near():
    g = make_grid()
    r = Raster(jnp.arange(g.ncell, dtype=jnp.float32).reshape(g.shape), g)
    # extent exactly on cell lines
    sub = crop(r, (g.xmin + 0.5, g.xmin + 1.5, g.ymax - 1.0, g.ymax - 0.2))
    assert sub.grid.ncols == 10 and sub.grid.nrows == 8
    assert np.isclose(sub.grid.xmin, g.xmin + 0.5)
    assert np.isclose(sub.grid.ymax, g.ymax - 0.2)
    # values come from the right window
    assert np.allclose(np.asarray(sub.data), np.asarray(r.data)[2:10, 5:15])


def test_extend_and_offsets():
    g = make_grid()
    r = Raster(jnp.ones((5, 6), jnp.float32), g.subgrid(3, 8, 4, 10))
    big = extend(r, g)
    arr = np.asarray(big.data)
    assert arr.shape == g.shape
    assert np.all(arr[3:8, 4:10] == 1)
    assert np.all(np.isnan(arr[0]))


def test_mosaic_mean_and_first():
    g = make_grid(nrows=4, ncols=4)
    a = Raster(jnp.full((4, 2), 1.0), g.subgrid(0, 4, 0, 2))
    b = Raster(jnp.full((4, 3), 3.0), g.subgrid(0, 4, 1, 4))
    m = mosaic([a, b], g, fun="mean")
    arr = np.asarray(m.data)
    assert np.all(arr[:, 0] == 1.0)
    assert np.all(arr[:, 1] == 2.0)  # overlap averaged
    assert np.all(arr[:, 2:] == 3.0)
    f = mosaic([a, b], g, fun="first")
    arr = np.asarray(f.data)
    assert np.all(arr[:, 1] == 1.0)  # first wins in overlap


def test_extract_nearest_cell():
    g = make_grid()
    vals = jnp.arange(g.ncell, dtype=jnp.float32).reshape(g.shape)
    r = Raster(vals, g)
    xs = np.asarray(g.x_coords())
    ys = np.asarray(g.y_coords())
    # a point anywhere inside cell (3, 7) returns that cell's value
    got = extract(r, [xs[7] + 0.03], [ys[3] - 0.04])
    assert np.isclose(np.asarray(got)[0], 3 * 30 + 7)
    # out of grid -> NaN
    got = extract(r, [g.xmin - 1.0], [ys[3]])
    assert np.isnan(np.asarray(got)[0])


def test_extract_stack_shape():
    g = make_grid()
    r = Raster(jnp.zeros((3,) + g.shape), g, ("a", "b", "c"))
    got = extract(r, np.asarray(g.x_coords())[:5], np.full(5, np.asarray(g.y_coords())[0]))
    assert got.shape == (5, 3)


def test_stack_and_band():
    g = make_grid()
    a = Raster(jnp.zeros(g.shape), g, ("alt",))
    b = Raster(jnp.ones(g.shape), g, ("slope",))
    s = stack([a, b])
    assert s.names == ("alt", "slope")
    assert s.nbands == 2
    assert np.all(np.asarray(s.band(1).data) == 1)


def test_resample_near():
    g = make_grid(nrows=10, ncols=10)
    fine = GridSpec(nrows=20, ncols=20, xmin=g.xmin, ymax=g.ymax, dx=0.05, dy=0.05)
    r = Raster(jnp.arange(100, dtype=jnp.float32).reshape(10, 10), g)
    up = resample_near(r, fine)
    arr = np.asarray(up.data)
    assert arr.shape == (20, 20)
    # each coarse cell maps to a 2x2 block
    assert np.all(arr[0:2, 0:2] == 0)
    assert np.all(arr[2:4, 2:4] == 11)


def test_aligned_with():
    g = make_grid()
    assert g.subgrid(2, 10, 3, 20).aligned_with(g)
    shifted = GridSpec(g.nrows, g.ncols, g.xmin + 0.033, g.ymax, g.dx, g.dy)
    assert not shifted.aligned_with(g)
