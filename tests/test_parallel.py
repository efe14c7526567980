"""Multi-device tests on the 8-way virtual CPU mesh: sharded tiled TPS,
pack_tiles masking, and the driver entry points (SURVEY.md §2.2's TPU-native
parallelism mapping)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from machisplin_tpu.parallel import batched_tile_tps, make_mesh, pack_tiles
from machisplin_tpu.ops.tps import tps_fit, tps_predict

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _tiles(rng, n_tiles=8, knots=40):
    coords, ys = [], []
    for t in range(n_tiles):
        k = knots - (t % 3) * 5          # intentionally ragged sizes
        c = rng.uniform(0, 1, (k, 2))
        coords.append(c)
        ys.append(np.sin(3 * c[:, 0]) + 0.05 * rng.standard_normal(k))
    return coords, ys


def test_pack_tiles_masks(rng):
    coords, ys = _tiles(rng)
    c, y, m = pack_tiles(coords, ys)
    assert c.shape[0] == 8 and c.shape[2] == 2
    np.testing.assert_allclose(np.asarray(m).sum(1), [len(q) for q in coords])


def test_sharded_tiles_match_per_tile_fits(rng):
    coords, ys = _tiles(rng)
    c, y, m = pack_tiles(coords, ys)
    origins = jnp.asarray(np.stack([np.zeros(8), np.ones(8)], 1))
    mesh = make_mesh(8)
    surf_sharded = np.asarray(
        batched_tile_tps(
            c, y, m, origins, tile_shape=(12, 12), cell=(1 / 12, 1 / 12),
            ngrid=64, refine=12, mesh=mesh,
        )
    )
    surf_vmap = np.asarray(
        batched_tile_tps(
            c, y, m, origins, tile_shape=(12, 12), cell=(1 / 12, 1 / 12),
            ngrid=64, refine=12,
        )
    )
    # sharded execution is numerically identical to single-device vmap
    np.testing.assert_allclose(surf_sharded, surf_vmap, rtol=1e-6, atol=1e-8)

    # and each tile equals its standalone dense fit evaluated on the grid
    for t in [0, 3]:
        model = tps_fit(jnp.asarray(coords[t]), jnp.asarray(ys[t]), ngrid=64, refine=12)
        xs = (np.arange(12) + 0.5) / 12
        yy = 1.0 - (np.arange(12) + 0.5) / 12
        pts = np.stack(np.meshgrid(xs, yy, indexing="xy"), -1).reshape(-1, 2)
        want = np.asarray(tps_predict(model, pts)).reshape(12, 12)
        np.testing.assert_allclose(surf_sharded[t], want, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_dryrun_multichip(n_dev):
    import __graft_entry__ as ge

    ge.dryrun_multichip(n_dev)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
