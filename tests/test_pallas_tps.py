"""Pallas TPS grid kernel vs the jnp reference path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from machisplin_tpu.grid import GridSpec
from machisplin_tpu.ops.tps import tps_fit, tps_predict_grid
from machisplin_tpu.ops.pallas_tps import tps_grid_pallas


@pytest.mark.parametrize("n_resp", [1, 3])
def test_pallas_kernel_matches_jnp(rng, n_resp):
    pts = rng.uniform(0, 1, size=(50, 2)).astype(np.float32)
    pts[0] = (0, 0)
    pts[1] = (1, 1)
    ys = np.stack(
        [np.sin(3 * pts[:, 0] + j) + np.cos(2 * pts[:, 1]) for j in range(n_resp)],
        axis=1,
    ).astype(np.float32)
    y = ys[:, 0] if n_resp == 1 else ys
    model = tps_fit(jnp.asarray(pts), jnp.asarray(y), lam=1e-5)
    grid = GridSpec(nrows=19, ncols=140, xmin=0.0, ymax=1.0, dx=1 / 140, dy=1 / 19)

    want = np.asarray(tps_predict_grid(model, grid, use_pallas=False))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(tps_grid_pallas(model, grid))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
