"""Model zoo protocol.

Every algorithm module exposes the same pure-functional triple so CV folds,
response variables and ensemble members batch under vmap (SURVEY.md §7 stage 3):

    fit(key, x, y, *, sample_weight=None, **hyper) -> state   (a pytree)
    predict(state, x) -> yhat
    importance(state, names, ...) -> {variable: score}  (host-side report)

``x`` is (n, p) float, ``y`` (n,).  ``sample_weight`` is the masking hook: a
0/1 weight vector lets fixed-shape fold splits train on a subset without
dynamic shapes (the TPU-native replacement for R's per-fold data frames,
V73:225-252).

The six algorithms mirror the reference's zoo (V73:247-252 CV hyperparameters,
V73:447-613 final-fit blocks):

    brt  - boosted regression trees w/ gbm.step tree-count CV   (models/brt.py)
    gam  - mgcv::gam with no s() terms == ordinary least squares (models/gam.py)
    nn   - nnet 10-unit single-hidden-layer MLP                  (models/nn.py)
    mars - earth MARS, forward hinges + GCV backward pruning     (models/mars.py)
    rf   - randomForest regression                               (models/rf.py)
    svm  - kernlab ksvm eps-SVR with RBF kernel                  (models/svm.py)
"""
from __future__ import annotations

import jax.numpy as jnp

ALGORITHM_LETTERS = {
    # single-letter codes used across the reference's summaries (V73:340-362)
    "brt": "b",
    "gam": "g",
    "nn": "n",
    "mars": "m",
    "rf": "r",
    "svm": "v",
}

# the order in which the reference assembles its letter string (V73:340-362)
LETTER_ORDER = ("b", "g", "n", "m", "r", "v")
LETTER_TO_NAME = {v: k for k, v in ALGORITHM_LETTERS.items()}


def as_weight(sample_weight, n, dtype=jnp.float32):
    if sample_weight is None:
        return jnp.ones((n,), dtype)
    return jnp.asarray(sample_weight, dtype)


def weighted_mean(v, w, axis=None):
    return jnp.sum(v * w, axis=axis) / jnp.maximum(jnp.sum(w, axis=axis), 1e-12)
