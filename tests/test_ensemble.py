"""Ensemble layer tests: kfold semantics, weight objective + selection quirks
(V73:220-429), CV driver residual collection."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from machisplin_tpu.ensemble import (
    CVConfig,
    ensemble_objective,
    fold_masks,
    kfold,
    optimize_weights_lbfgsb,
    optimize_weights_sweep,
    residual_matrix,
    run_cv,
)


def test_kfold_near_equal_groups():
    f = np.asarray(kfold(jax.random.PRNGKey(0), 105, 10))
    counts = np.bincount(f, minlength=10)
    assert counts.sum() == 105
    assert counts.max() - counts.min() <= 1


def test_kfold_insufficient_records():
    with pytest.raises(ValueError, match="insufficient"):
        kfold(jax.random.PRNGKey(0), 5, 10)


def test_kfold_stratified():
    by = np.repeat([0, 1], 50)
    f = np.asarray(kfold(jax.random.PRNGKey(0), 100, 5, by=by))
    for g in (0, 1):
        counts = np.bincount(f[by == g], minlength=5)
        assert counts.max() - counts.min() <= 1


def test_fold_masks_invert():
    folds = jnp.asarray(np.arange(20) % 4)
    train, test = fold_masks(folds, 4)
    assert np.allclose(np.asarray(train + test), 1.0)
    assert np.asarray(train).sum(axis=1)[0] == 15
    train_i, test_i = fold_masks(folds, 4, invert=True)
    assert np.asarray(train_i).sum(axis=1)[0] == 5  # >4000-row inversion rule


def test_weight_objective_normalizes():
    res = np.array([[1.0, 1.0], [-1.0, -1.0]])
    # equal weights cancel the residuals entirely
    val = float(ensemble_objective(jnp.asarray([0.5, 0.5]), jnp.asarray(res)))
    assert val < 1e-12
    # scaling all weights equally changes nothing
    v1 = float(ensemble_objective(jnp.asarray([0.2, 0.6]), jnp.asarray(res)))
    v2 = float(ensemble_objective(jnp.asarray([0.1, 0.3]), jnp.asarray(res)))
    assert pytest.approx(v1) == v2


def _toy_residuals(rng):
    # algo 0 is accurate; algos 1, 2 carry independent large noise
    n = 200
    return np.stack([
        0.05 * rng.standard_normal(n),
        1.0 * rng.standard_normal(n),
        1.0 * rng.standard_normal(n),
    ])


def test_lbfgsb_weights_prefer_good_algorithms(rng):
    res = _toy_residuals(rng)
    out = optimize_weights_lbfgsb(res, letters="bgr")
    # weights are scale-free; what matters is the good algorithm's share
    share = out.weights[0] / out.weights.sum()
    assert share > 0.8
    # b must be kept; selection uses round(w,2) > 0.05*total (V73:337-340)
    assert "b" in out.letters
    assert out.objective < float(ensemble_objective(jnp.ones(3) / 3, jnp.asarray(res)))


def test_weights_anticorrelated_cancellation(rng):
    """The reference's objective rewards residual cancellation — two biased,
    anti-correlated algorithms can outweigh a single good one.  Pin that
    behavior down so nobody 'fixes' it to naive accuracy weighting."""
    n = 200
    good = 0.05 * rng.standard_normal(n)
    noise = rng.standard_normal(n)
    res = np.stack([good, 2.0 + noise, -2.0 - noise])
    out = optimize_weights_lbfgsb(res, letters="bgr")
    mixed = float(ensemble_objective(jnp.asarray(out.weights), jnp.asarray(res)))
    good_only = float(np.sum(good**2))
    assert mixed <= good_only * 1.05


def test_sweep_matches_lbfgsb_quality(rng):
    res = _toy_residuals(rng)
    a = optimize_weights_lbfgsb(res, letters="bgr")
    b = optimize_weights_sweep(res, letters="bgr")
    assert b.objective <= a.objective * 1.25


def test_percent_text_format(rng):
    res = _toy_residuals(rng)
    out = optimize_weights_lbfgsb(res, letters="bgr")
    if len(out.kept_weights) > 1:
        parts = out.percent_text.split(":")
        assert len(parts) == len(out.kept_weights)
        assert pytest.approx(sum(float(p) for p in parts), abs=0.5) == 100.0


def test_percent_text_single_model_prints_100(rng):
    """A single-model ensemble prints '100' like the reference summary does;
    the reference's txt==1 -> 'none' remap (V73:429) never fires on the
    normal flow."""
    res = np.stack([0.01 * rng.standard_normal(50)])  # one algorithm only
    out = optimize_weights_lbfgsb(res, letters="b")
    assert out.letters == "b"
    assert out.percent_text == "100"


SMALL_CV = CVConfig(
    n_folds=4,
    brt=dict(tree_complexity=3, learning_rate=0.1, step_size=20, max_trees=100),
    rf=dict(ntree=20, tree_chunk=10),
    nn=dict(hidden=5, maxit=80),
)


def test_run_cv_residual_shapes(rng):
    n = 120
    x = jnp.asarray(rng.uniform(0, 1, (n, 4)))
    y = jnp.asarray(2 * np.asarray(x)[:, 0] + np.sin(5 * np.asarray(x)[:, 1]))
    out = run_cv(jax.random.PRNGKey(0), x, y, config=SMALL_CV)
    assert set(out) == set("bgnmrv")
    for letter, res in out.items():
        assert res.shape == (n,), letter          # fold-major concat, k-1/k split
        assert np.isfinite(res).all(), letter
    mat = residual_matrix(out)
    assert mat.shape == (6, n)
    # every algorithm beats the null model out-of-fold on this easy surface
    tss = float(np.sum((np.asarray(y) - np.asarray(y).mean()) ** 2))
    for letter, res in out.items():
        assert np.sum(res**2) < tss, letter


def test_aicc_subset_selection(rng):
    from machisplin_tpu.ensemble import optimize_weights_aicc

    res = _toy_residuals(rng)
    out = optimize_weights_aicc(res, letters="bgr")
    # the accurate algorithm is in the chosen subset; the pure-noise ones
    # cost AICc parameters without cancelling anything
    assert "b" in out.letters
    assert set(out.weights.tolist()) <= {0.0, 1.0}
    if len(out.kept_weights) > 1:
        assert ":" in out.percent_text


def test_run_cv_inverted_svm_trains_on_gathered_fold(rng):
    """Round 5: in the inverted regime the SVM letter gathers each model's
    ~n/k active training rows instead of carrying masked (n, n) kernels
    (the config-3 worker-crash fix).  The gathered fit must retain the
    signal (the fold IS the training set) and produce the inverted
    fold-major residual layout."""
    n, k = 240, 4
    x = jnp.asarray(rng.uniform(0, 1, (n, 3)))
    y = jnp.asarray(
        np.sin(3 * np.asarray(x)[:, 0]) + 0.05 * rng.standard_normal(n)
    )
    cfg = CVConfig(n_folds=k, invert_threshold=100)
    out = run_cv(jax.random.PRNGKey(2), x, y, config=cfg, algorithms="v")
    res = out["v"]
    assert res.shape == ((k - 1) * n,)
    assert np.isfinite(res).all()
    # trained on 60 rows, tested on 180: still far better than predicting
    # the mean (the signal std is ~0.7, the noise 0.05)
    assert np.sqrt(np.mean(res**2)) < 0.3


def test_run_cv_inverted_split_over_4000_rows(rng):
    """Above 4000 rows the reference trains on ONE fold and tests on the
    rest (V73:227-232): the fold-major residual concat then has (k-1) * n/k
    entries per fold = n * (k-1) / k * k total."""
    n = 4400
    x = jnp.asarray(rng.uniform(0, 1, (n, 3)))
    y = jnp.asarray(2 * np.asarray(x)[:, 0] + 0.01 * rng.standard_normal(n))
    out = run_cv(jax.random.PRNGKey(1), x, y, config=CVConfig(n_folds=4), algorithms="g")
    # each of the 4 folds tests on the other 3 folds' rows
    assert out["g"].shape == (3 * n,)
    assert np.isfinite(out["g"]).all()


def test_run_cv_nn_segmented_matches_single_dispatch(rng, monkeypatch):
    """Round 5: the NN letter's segmented L-BFGS driver (bounded device
    programs, the config-3 watchdog guard) must reproduce the
    single-dispatch path bit-for-bit."""
    from machisplin_tpu.ensemble import cv as cv_mod

    n, k = 120, 3
    x = jnp.asarray(rng.uniform(0, 1, (n, 3)))
    y = jnp.asarray(np.sin(3 * np.asarray(x)[:, 0]) + 0.1 * rng.standard_normal(n))
    cfg = CVConfig(n_folds=k, nn=dict(hidden=4, maxit=90))
    a = run_cv(jax.random.PRNGKey(4), x, y, config=cfg, algorithms="n")
    monkeypatch.setattr(cv_mod, "_NN_DISPATCH_WORK", 1)
    b = run_cv(jax.random.PRNGKey(4), x, y, config=cfg, algorithms="n")
    np.testing.assert_array_equal(a["n"], b["n"])
