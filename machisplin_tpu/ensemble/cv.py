"""k-fold cross-validation of the six-algorithm zoo.

Reference semantics (V73:220-320): assign k=10 folds once, then per fold train
all six algorithms on the train split and collect test-split residuals,
concatenated fold-major into one vector per algorithm; when the dataset
exceeds 4000 rows the split is INVERTED — train on one fold, test on the other
nine (V73:227-232, preserved behind ``invert``).  The NN response is
min-shifted/max-scaled to [0,1] using *train-split* statistics per fold
(V73:234-241).

TPU-native: gam/nn/mars/svm folds are vmapped (sample-weight masks give every
fold the same static shapes); gbm.step batches ALL outer folds into one
while_loop (models/gbm_step.fit_outer_batched — 100 boosting chains advance
in lockstep); RF runs fold-sequential to keep peak memory flat, with all
per-fold compute jitted.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models import brt, gam, gbm_step, mars, nn, rf, svm
from .kfold import fold_masks, kfold


@dataclasses.dataclass(frozen=True)
class CVConfig:
    """Hyperparameters; defaults mirror the reference's CV call sites
    (V73:247-252).  Tests shrink these for speed."""

    n_folds: int = 10
    invert_threshold: int = 4000
    brt: dict = dataclasses.field(
        default_factory=lambda: dict(
            tree_complexity=25, learning_rate=0.01, bag_fraction=0.5,
            step_size=50, max_trees=10000,
        )
    )
    rf: dict = dataclasses.field(default_factory=lambda: dict(ntree=500))
    nn: dict = dataclasses.field(default_factory=lambda: dict(hidden=10, maxit=400))
    mars: dict = dataclasses.field(default_factory=dict)
    svm: dict = dataclasses.field(default_factory=dict)
    gam: dict = dataclasses.field(default_factory=dict)


def _nn_fold(key, x, y, train_w, cfg):
    """NN with the reference's per-fold [0,1] response transform."""
    big = jnp.finfo(y.dtype).max
    y_min = jnp.min(jnp.where(train_w > 0, y, big))
    y_shift = y - y_min
    y_max = jnp.max(jnp.where(train_w > 0, y_shift, -big))
    y_max = jnp.maximum(y_max, 1e-12)
    state = nn.fit(key, x, y_shift / y_max, sample_weight=train_w, **cfg)
    return nn.predict(state, x) * y_max + y_min


def run_cv(
    key,
    x,
    y,
    *,
    config: CVConfig | None = None,
    algorithms: str = "bgnmrv",
) -> dict[str, np.ndarray]:
    """Returns {letter: fold-major concatenated test residuals}."""
    config = config or CVConfig()
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = x.shape[0]
    k = config.n_folds
    kf, kb, kr, kn, ks, krest = jax.random.split(key, 6)
    folds = kfold(kf, n, k)
    invert = n > config.invert_threshold
    train_w, test_w = fold_masks(folds, k, invert=invert)
    train_w = train_w.astype(x.dtype)
    test_w = test_w.astype(x.dtype)

    preds: dict[str, Any] = {}

    if "g" in algorithms:
        fit_g = jax.jit(jax.vmap(lambda w: gam.predict(gam.fit(None, x, y, sample_weight=w, **config.gam), x)))
        preds["g"] = fit_g(train_w)
    if "n" in algorithms:
        keys = jax.random.split(kn, k)
        fit_n = jax.jit(jax.vmap(lambda kk, w: _nn_fold(kk, x, y, w, config.nn)))
        preds["n"] = fit_n(keys, train_w)
    if "m" in algorithms:
        fit_m = jax.jit(jax.vmap(lambda w: mars.predict(mars.fit(None, x, y, sample_weight=w, **config.mars), x)))
        preds["m"] = fit_m(train_w)
    if "v" in algorithms:
        keys = jax.random.split(ks, k)
        fit_v = jax.jit(jax.vmap(lambda kk, w: svm.predict(svm.fit(kk, x, y, sample_weight=w, **config.svm), x)))
        preds["v"] = fit_v(keys, train_w)
    if "r" in algorithms:
        rows = []
        fit_r = jax.jit(lambda kk, w: rf.predict(rf.fit(kk, x, y, sample_weight=w, **config.rf), x))
        for v in range(k):
            rows.append(fit_r(jax.random.fold_in(kr, v), train_w[v]))
        preds["r"] = jnp.stack(rows)
    if "b" in algorithms:
        # all outer folds' gbm.step runs batched into one while_loop
        preds_b, _ = gbm_step.fit_outer_batched(kb, x, y, train_w, **config.brt)
        preds["b"] = jnp.asarray(preds_b)
    del krest

    # fold-major concatenation of test residuals (V73:255-319)
    test_np = np.asarray(test_w) > 0
    out: dict[str, np.ndarray] = {}
    y_np = np.asarray(y)
    for letter, p in preds.items():
        p_np = np.asarray(p)
        out[letter] = np.concatenate(
            [y_np[test_np[v]] - p_np[v][test_np[v]] for v in range(k)]
        )
    return out


def residual_matrix(cv_out: dict[str, np.ndarray], letters: str = "bgnmrv") -> np.ndarray:
    """(A, n_concat) matrix in canonical letter order for the weight search."""
    return np.stack([cv_out[letter] for letter in letters])
