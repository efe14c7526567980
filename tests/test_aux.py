"""Aux subsystem tests: deviance families, bundled data loaders, checkpoint/
resume, phase timing, run log (SURVEY.md §5 gaps closed)."""
import logging
import os

import jax.numpy as jnp
import numpy as np
import pytest

import machisplin_tpu as mt
from machisplin_tpu.data import example_grid, load_sampling, synthetic_covariates
from machisplin_tpu.io.checkpoint import load_layer, mltps_resumable, save_layer
from machisplin_tpu.models.deviance import calc_deviance
from machisplin_tpu.utils import PhaseTimer, run_log


def test_calc_deviance_gaussian_is_mse():
    obs = jnp.asarray([1.0, 2.0, 3.0])
    pred = jnp.asarray([1.5, 2.0, 2.0])
    assert float(calc_deviance(obs, pred)) == pytest.approx((0.25 + 0 + 1) / 3)
    assert float(calc_deviance(obs, pred, calc_mean=False)) == pytest.approx(1.25)


def test_calc_deviance_families_positive():
    obs = jnp.asarray([0.0, 1.0, 1.0, 0.0])
    pred = jnp.asarray([0.1, 0.8, 0.6, 0.4])
    assert float(calc_deviance(obs, pred, family="bernoulli")) > 0
    counts = jnp.asarray([0.0, 2.0, 5.0])
    mu = jnp.asarray([0.5, 2.0, 4.0])
    assert float(calc_deviance(counts, mu, family="poisson")) > 0
    # poisson deviance of a perfect fit is ~0
    assert float(calc_deviance(counts, jnp.maximum(counts, 1e-9), family="poisson")) < 1e-6
    assert float(calc_deviance(counts, mu, family="laplace")) == pytest.approx(
        float(jnp.mean(jnp.abs(counts - mu)))
    )


def test_load_sampling_matches_reference_fixture():
    d = load_sampling()
    assert d.shape == (813,)
    assert d.dtype.names == ("long", "lat", "bio_1", "bio_12")
    assert -77.8 < d["long"].min() < d["long"].max() < -75.0
    assert -7.9 < d["lat"].min() < d["lat"].max() < -5.8


def test_example_grid_geometry():
    g = example_grid()
    assert (g.ncols, g.nrows) == (3264, 2476)
    assert np.isclose(g.xmin, -77.7435765934)
    g8 = example_grid(8)
    assert g8.shape == (2476 // 8, 3264 // 8)


def test_synthetic_covariates_shape():
    s = synthetic_covariates(downsample=16)
    assert s.names == ("alt", "slope", "TWI")
    assert np.isfinite(np.asarray(s.data)).all()


def test_checkpoint_roundtrip(tmp_path, rng):
    g = mt.GridSpec(nrows=10, ncols=12, xmin=0, ymax=1, dx=0.1, dy=0.1)
    r = mt.Raster(jnp.asarray(rng.standard_normal((10, 12)).astype(np.float32)), g, ("bio_1",))
    from machisplin_tpu.pipeline.mltps import LayerResult

    res = LayerResult(
        name="bio_1", final=r,
        residuals=rng.standard_normal((5, 3)),
        var_imp={"gam": {"alt": 1.0}},
        summary={"layer": "bio_1", "r2 ensemble:": 0.9},
        n_layers=1, ensemble=r,
    )
    path = str(tmp_path / "bio_1.npz")
    save_layer(path, res)
    back = load_layer(path)
    assert back.name == "bio_1"
    np.testing.assert_allclose(np.asarray(back.final.data), np.asarray(r.data))
    assert back.final.grid.shape == g.shape
    np.testing.assert_allclose(back.residuals, res.residuals)
    assert back.var_imp == res.var_imp
    assert back.summary["r2 ensemble:"] == 0.9


def test_phase_timer_report():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    with t.phase("a"):
        pass
    rep = t.report()
    assert "a" in rep and "b" in rep and "TOTAL" in rep
    assert set(t.as_dict()) == {"a", "b"}


def test_run_log_writes_file(tmp_path):
    path = str(tmp_path / "MachiSplin.LOG.txt")
    with run_log(path, echo=False):
        logging.getLogger("machisplin").info("hello pipeline")
    assert "hello pipeline" in open(path).read()


def test_mltps_resumable_skips_done_layers(tmp_path, rng, monkeypatch):
    import machisplin_tpu as mt
    from machisplin_tpu.ensemble import CVConfig
    from machisplin_tpu.grid import extract
    from machisplin_tpu.io import checkpoint as ck

    g = mt.GridSpec(nrows=24, ncols=20, xmin=-77.0, ymax=-6.0, dx=0.05, dy=0.05)
    xs, ys = np.meshgrid(np.asarray(g.x_coords()), np.asarray(g.y_coords()))
    stack = mt.Raster(jnp.asarray(np.stack([1000 + 100 * xs, ys * 10])), g, ("alt", "slope"))
    lon = rng.uniform(g.xmin + 0.02, g.xmax - 0.02, 60)
    lat = rng.uniform(g.ymin + 0.02, g.ymax - 0.02, 60)
    resp = 2.0 * lon + lat + 0.01 * rng.standard_normal(60)
    dat = np.rec.fromarrays([lon, lat, resp, resp * 2], names="long,lat,a,b")

    cfg = mt.MLTPSConfig(
        cv=CVConfig(n_folds=3,
                    brt=dict(tree_complexity=2, learning_rate=0.2, step_size=10, max_trees=30),
                    rf=dict(ntree=8, tree_chunk=4), nn=dict(hidden=3, maxit=30)),
        final_brt=dict(tree_complexity=2, learning_rate=0.2, step_size=10, max_trees=30),
        final_rf=dict(ntree=8, tree_chunk=4), final_nn=dict(hidden=3, maxit=30),
        use_pallas=False, svm_importance_sample=20,
    )
    out1 = ck.mltps_resumable(dat, stack, str(tmp_path), tps=False, config=cfg)
    assert [r.name for r in out1] == ["a", "b"]
    assert os.path.exists(str(tmp_path / "a.npz"))

    # second run must load from checkpoints without calling mltps at all
    def boom(*a, **k):
        raise AssertionError("mltps re-ran despite checkpoints")

    import sys

    monkeypatch.setattr(sys.modules["machisplin_tpu.pipeline.mltps"], "mltps", boom)
    out2 = ck.mltps_resumable(dat, stack, str(tmp_path), tps=False, config=cfg)
    np.testing.assert_allclose(
        np.asarray(out2[0].final.data), np.asarray(out1[0].final.data), equal_nan=True
    )
