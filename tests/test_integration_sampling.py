"""Integration: the reference's bundled workload end to end (BASELINE.json
configs 1-2 shape, downscaled) — 813 real stations, bundled grid geometry,
full six-algorithm ensemble + TPS correction + writers."""
import os

import jax.numpy as jnp
import numpy as np

import machisplin_tpu as mt
from machisplin_tpu.data import load_sampling, synthetic_covariates
from machisplin_tpu.ensemble import CVConfig
from machisplin_tpu.grid import extract


def test_sampling_mltps_end_to_end(tmp_path):
    dat = load_sampling()[["long", "lat", "bio_1"]]
    stack = synthetic_covariates(downsample=24)  # 103 x 136 cells
    cfg = mt.MLTPSConfig(
        cv=CVConfig(
            n_folds=4,
            brt=dict(tree_complexity=3, learning_rate=0.1, step_size=20, max_trees=100),
            rf=dict(ntree=16, tree_chunk=8),
            nn=dict(hidden=6, maxit=60),
            svm=dict(epochs=60),
        ),
        final_brt=dict(tree_complexity=3, learning_rate=0.1, step_size=20, max_trees=100),
        final_rf=dict(ntree=16, tree_chunk=8),
        final_nn=dict(hidden=6, maxit=60),
        final_svm=dict(epochs=60),
        use_pallas=False,
        svm_importance_sample=30,
    )
    out = mt.mltps(dat, stack, tps=True, config=cfg)
    r = out[0]
    # the TPS residual correction must push station-level fit high even though
    # the synthetic covariates only weakly explain real bio_1 (the reference's
    # bundled example reports R2 > 0.99 with its real covariates)
    assert r.summary["r2 ensemble:"] > 0.5
    # the correction must IMPROVE the fit (round-1 regression guard: a
    # precision bug once made it harmful and silently discarded) and push
    # station R^2 near the reference's >0.99 claim
    assert r.summary["r2 final:"] > r.summary["r2 ensemble:"]
    assert r.summary["r2 final:"] > 0.97
    assert r.residuals.shape == (813, 3)
    # extraction of the final surface at the stations is consistent with the
    # recorded residuals
    at = np.asarray(extract(r.final, dat["long"], dat["lat"]))
    np.testing.assert_allclose(dat["bio_1"] - at, r.residuals[:, 0], atol=1e-3)

    paths = mt.write_geotiff([r], str(tmp_path), seed=7)
    assert any(p.endswith("bio_1.tif") for p in paths)
    back = mt.read_geotiff(os.path.join(str(tmp_path), "bio_1.tif"))
    assert back.grid.shape == stack.grid.shape
    assert np.isclose(back.grid.xmin, stack.grid.xmin)
