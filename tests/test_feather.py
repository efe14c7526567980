"""Feathering tests: crossfade weights, seamlessness, constant preservation
(reference part 4 semantics, V73:756-896)."""
import jax.numpy as jnp
import numpy as np

from machisplin_tpu.grid import GridSpec, Raster, crop
from machisplin_tpu.ops.feather import crossfade, feather_blend


def make_world(nrows=40, ncols=60):
    return GridSpec(nrows=nrows, ncols=ncols, xmin=0.0, ymax=1.0, dx=1 / 60, dy=1 / 40)


def overlapping_tiles(g, vals):
    """2x2 bottom-up row-major tiles with ~20% overlap, constant values."""
    xmin, xmax, ymin, ymax = g.extent
    dx2, dy2 = (xmax - xmin) / 2, (ymax - ymin) / 2
    ov_x, ov_y = dx2 * 0.2, dy2 * 0.2
    exts = []
    for j in range(2):
        for h in range(2):
            exts.append((
                max(xmin, xmin + h * dx2 - ov_x), min(xmax, xmin + (h + 1) * dx2 + ov_x),
                max(ymin, ymin + j * dy2 - ov_y), min(ymax, ymin + (j + 1) * dy2 + ov_y),
            ))
    base = Raster(jnp.zeros(g.shape), g)
    tiles = []
    for v, e in zip(vals, exts):
        t = crop(base, e)
        tiles.append(Raster(jnp.full(t.grid.shape, float(v)), t.grid))
    return tiles


def test_crossfade_weights_sum_to_one():
    g = make_world()
    tiles = overlapping_tiles(g, [1.0, 1.0, 1.0, 1.0])
    s = crossfade(tiles[0], tiles[1], "x")
    assert s is not None
    np.testing.assert_allclose(np.asarray(s.data), 1.0, atol=1e-12)


def test_crossfade_endpoints():
    g = make_world()
    tiles = overlapping_tiles(g, [0.0, 10.0, 0.0, 0.0])
    s = crossfade(tiles[0], tiles[1], "x")
    arr = np.asarray(s.data)
    # left edge of strip: left tile dominates (value 0); right edge: value 10
    assert arr[0, 0] < arr[0, -1]
    assert arr[0, 0] < 1.0
    assert arr[0, -1] > 9.0


def test_feather_blend_constant_world():
    g = make_world()
    tiles = overlapping_tiles(g, [7.0] * 4)
    out = feather_blend(tiles, 2, 2, g)
    arr = np.asarray(out.data)
    assert np.isfinite(arr).all()
    np.testing.assert_allclose(arr, 7.0, atol=1e-9)


def test_feather_blend_monotone_seam():
    g = make_world()
    tiles = overlapping_tiles(g, [0.0, 4.0, 0.0, 4.0])
    out = feather_blend(tiles, 2, 2, g)
    arr = np.asarray(out.data)
    assert np.isfinite(arr).all()
    # away from the horizontal overlap band (where vertical and horizontal
    # strips average, as in the reference's strip mosaic) rows transition
    # monotonically from 0 to 4 with ramp-sized increments
    for row in np.concatenate([arr[:8], arr[-8:]]):
        d = np.diff(row)
        assert d.min() > -1e-6
        assert row[0] == 0.0 and abs(row[-1] - 4.0) < 1e-9
        assert d.max() < 1.0
    # globally, jumps stay well below the raw tile difference
    assert np.abs(np.diff(arr, axis=1)).max() < 2.5


def test_feather_blend_single_tile_passthrough():
    g = make_world()
    r = Raster(jnp.full(g.shape, 3.0), g)
    out = feather_blend([r], 1, 1, g)
    np.testing.assert_allclose(np.asarray(out.data), 3.0)
