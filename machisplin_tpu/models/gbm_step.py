"""gbm.step — CV-based selection of the boosted-tree count.

Re-implements the vendored Elith/Leathwick driver the reference uses for BRT
(machisplin.gbm.step, V73:1660-2239) with its exact selection semantics:

* k-fold selector: rep(1..n_folds) over the rows, randomly shuffled
  (V73:1749-1751);
* per-fold gaussian boosting grown in ``step_size``-tree cycles
  (V73:1884-1967), recording mean holdout deviance at each checkpoint;
* stop when the improvement between the means of the last 10 and previous 10
  checkpoints drops to ``tolerance`` (auto = 0.001 x total mean deviance,
  V73:1957-1961) or ``max_trees`` is reached;
* best.trees = the first checkpoint attaining the minimum mean holdout
  deviance (V73:1978-1983);
* final model refit on all rows with best.trees trees (V73:2100-2124).

Deviations (documented): the "restart with a smaller learning rate" early
abort (V73:1948-1955) is not replicated — training simply continues, and the
checkpoint argmin lands in the same place; per-fold models share quantile bin
edges computed on the full training subset (binning is already an
approximation the C++ gbm does not make).

TPU-native: the fold dimension is vmapped inside a single ``lax.while_loop``
over growth cycles, so all 10 fold models advance in lockstep on one chip;
the final refit reuses bucketed static tree budgets to bound recompiles.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import brt
from .base import as_weight
from .trees import bin_data, grow_bestfirst_tree, make_bins, tree_predict


class GBMStepResult(NamedTuple):
    final: brt.BRTState
    best_trees: int
    trees_fitted: int            # how many trees the CV loop actually grew
    cv_deviance: jax.Array       # (max_checkpoints,) mean holdout deviance (inf = not reached)
    cv_deviance_se: jax.Array    # (max_checkpoints,) between-fold standard errors


def _cv_deviance_curve(
    key, x, y, w, *, n_folds, n_splits, lr, bag_fraction, min_leaf,
    step_size, max_trees, tolerance, n_bins,
):
    n, p = x.shape
    edges = make_bins(x, n_bins)
    xb = bin_data(x, edges)

    # fold selector: rep(1..k) shuffled over the active rows (V73:1749-1751)
    kfold, kboost = jax.random.split(key)
    order = jnp.argsort(jax.random.uniform(kfold, (n,)) + (w <= 0) * 10.0)
    seq = (jnp.arange(n) % n_folds).astype(jnp.int32)
    selector = jnp.zeros((n,), jnp.int32).at[order].set(seq)

    fold_ids = jnp.arange(n_folds)
    train_w = (selector[None, :] != fold_ids[:, None]).astype(x.dtype) * w[None, :]
    test_w = (selector[None, :] == fold_ids[:, None]).astype(x.dtype) * w[None, :]
    test_sum = jnp.maximum(jnp.sum(test_w, axis=1), 1.0)
    train_sum = jnp.maximum(jnp.sum(train_w, axis=1), 1.0)
    f0 = jnp.sum(train_w * y[None, :], axis=1) / train_sum       # (k,)

    max_cp = max_trees // step_size

    def grow_cycle(key_c, f):
        """Advance every fold by step_size trees; f is (k, n)."""

        def tree_step(f, key_t):
            def per_fold(f_k, w_k, key_k):
                bag = (jax.random.uniform(key_k, (n,)) < bag_fraction).astype(x.dtype) * w_k
                tree = grow_bestfirst_tree(
                    xb, edges, y - f_k, bag, n_splits=n_splits, min_leaf=min_leaf
                )
                return f_k + lr * tree_predict(tree, x, n_splits)

            fold_keys = jax.random.split(key_t, n_folds)
            return jax.vmap(per_fold)(f, train_w, fold_keys), None

        keys = jax.random.split(key_c, step_size)
        f, _ = jax.lax.scan(tree_step, f, keys)
        return f

    def holdout_dev(f):
        return jnp.sum(test_w * (y[None, :] - f) ** 2, axis=1) / test_sum   # (k,)

    win = min(10, max_cp)  # static; the rule only ever fires when j >= 20

    def cond(carry):
        j, f, dev, keys_used = carry
        del f, keys_used
        not_done = j < max_cp
        warmed = j >= 20
        # reference windows (V73:1957-1961): test1 = last 10 checkpoints;
        # test2 = the 11 checkpoints before-and-including test1's first - 1
        # (they overlap at R index j-9)
        test1 = jnp.mean(
            jax.lax.dynamic_slice(dev, (jnp.maximum(j - win, 0), 0), (win, n_folds)), axis=0
        )
        win2 = min(win + 1, max_cp)  # static guard; rule only fires at j >= 20
        test2 = jnp.mean(
            jax.lax.dynamic_slice(
                dev, (jnp.maximum(j - 2 * win, 0), 0), (win2, n_folds)
            ),
            axis=0,
        )
        delta = jnp.mean(test2 - test1)   # mean over folds of checkpoint means
        return not_done & ((~warmed) | (delta > tolerance))

    def body(carry):
        j, f, dev, key_j = carry
        key_j, key_c = jax.random.split(key_j)
        f = grow_cycle(key_c, f)
        dev = dev.at[j].set(holdout_dev(f))
        return j + 1, f, dev, key_j

    f_init = jnp.broadcast_to(f0[:, None], (n_folds, n)).astype(x.dtype)
    dev_init = jnp.full((max_cp, n_folds), jnp.inf, x.dtype)
    j, _, dev, _ = jax.lax.while_loop(cond, body, (0, f_init, dev_init, kboost))
    return j, dev, edges


@functools.lru_cache(maxsize=32)
def _cycle_program(*, n_splits, lr, bag_fraction, min_leaf, step_size):
    """One jitted growth cycle for the batched CV curve: advances every
    (outer, inner) boosting chain by step_size trees and returns the holdout
    deviances.  Cached so repeated chunks/calls reuse the compiled program;
    run as a bounded device program because a whole-curve while_loop trips
    the remote runtime's program watchdog at this batch width."""

    @jax.jit
    def cycle(key_c, fmat, xb, edges, x, y, train_w, test_w, test_sum):
        f_outer, n_folds, n = fmat.shape

        def tree_step(fm, key_t):
            def per_model(f_k, w_k, key_k):
                bag = (jax.random.uniform(key_k, (n,)) < bag_fraction).astype(x.dtype) * w_k
                tree = grow_bestfirst_tree(
                    xb, edges, y - f_k, bag, n_splits=n_splits, min_leaf=min_leaf
                )
                return f_k + lr * tree_predict(tree, x, n_splits)

            # single-level vmap over the flattened (outer x inner) axis —
            # nested vmaps of the tree grower have faulted the TPU runtime
            keys = jax.random.split(key_t, f_outer * n_folds)
            flat = jax.vmap(per_model)(
                fm.reshape(f_outer * n_folds, n),
                train_w.reshape(f_outer * n_folds, n),
                keys,
            )
            return flat.reshape(f_outer, n_folds, n), None

        keys = jax.random.split(key_c, step_size)
        fmat, _ = jax.lax.scan(tree_step, fmat, keys)
        dev = jnp.sum(test_w * (y[None, None, :] - fmat) ** 2, axis=2) / test_sum
        return fmat, dev

    return cycle


def _cv_deviance_curve_multi(
    key, x, y, w_outer, *, n_folds, n_splits, lr, bag_fraction, min_leaf,
    step_size, max_trees, tolerance, n_bins,
):
    """All OUTER folds' gbm.step CV curves, batched.

    w_outer: (F, n) training masks (one per outer CV fold).  Every outer
    fold's inner-fold models advance in lockstep — F x K boosting chains per
    tree step — in bounded jitted cycle programs with the checkpoint/stop
    bookkeeping on the host; each outer fold freezes at its own stopping
    checkpoint (the reference's rule applied per gbm.step run).  Returns
    (stopped_at (F,), dev (max_cp, F, K), edges, binned x)."""
    n, p = x.shape
    edges = make_bins(x, n_bins)
    xb = bin_data(x, edges)
    f_outer = w_outer.shape[0]

    kfold, kboost = jax.random.split(key)

    def selector_for(kf, w):
        order = jnp.argsort(jax.random.uniform(kf, (n,)) + (w <= 0) * 10.0)
        seq = (jnp.arange(n) % n_folds).astype(jnp.int32)
        return jnp.zeros((n,), jnp.int32).at[order].set(seq)

    selectors = jax.vmap(selector_for)(jax.random.split(kfold, f_outer), w_outer)
    fold_ids = jnp.arange(n_folds)
    train_w = (
        (selectors[:, None, :] != fold_ids[None, :, None]).astype(x.dtype)
        * w_outer[:, None, :]
    )                                                        # (F, K, n)
    test_w = (
        (selectors[:, None, :] == fold_ids[None, :, None]).astype(x.dtype)
        * w_outer[:, None, :]
    )
    test_sum = jnp.maximum(jnp.sum(test_w, axis=2), 1.0)     # (F, K)
    train_sum = jnp.maximum(jnp.sum(train_w, axis=2), 1.0)
    f0 = jnp.sum(train_w * y[None, None, :], axis=2) / train_sum

    max_cp = max_trees // step_size
    win = min(10, max_cp)

    cycle_fn = _cycle_program(
        n_splits=n_splits, lr=lr, bag_fraction=bag_fraction,
        min_leaf=min_leaf, step_size=step_size,
    )
    fmat = jnp.broadcast_to(f0[:, :, None], (f_outer, n_folds, n)).astype(x.dtype)
    dev = np.full((max_cp, f_outer, n_folds), np.inf, np.float64)
    stopped = np.full((f_outer,), max_cp + 1, np.int64)
    key_j = kboost
    j = 0
    while j < max_cp and np.any(stopped > max_cp):
        key_j, key_c = jax.random.split(key_j)
        fmat, dev_j = cycle_fn(key_c, fmat, xb, edges, x, y, train_w, test_w, test_sum)
        dev[j] = np.asarray(dev_j)
        mean_curve = dev[: j + 1].mean(axis=2)               # (j+1, F)
        if j + 1 >= 20:
            # reference windows (V73:1957-1961, 1-indexed): test1 =
            # mean(cv[(j-9):j]) — 10 values; test2 = mean(cv[(j-19):(j-9)]) —
            # 11 values OVERLAPPING test1 at checkpoint j-9
            test1 = mean_curve[j + 1 - win : j + 1].mean(axis=0)
            test2 = mean_curve[j + 1 - 2 * win : j + 2 - win].mean(axis=0)
            fire = ((test2 - test1) <= tolerance) & (stopped > max_cp)
            stopped[fire] = j + 1
        j += 1
    stopped = np.minimum(stopped, j)
    return jnp.asarray(stopped), jnp.asarray(dev, x.dtype), edges, xb


def fit_outer_batched(
    key,
    x,
    y,
    outer_train_w,
    *,
    tree_complexity: int = 25,
    learning_rate: float = 0.01,
    bag_fraction: float = 0.5,
    n_folds: int = 10,
    step_size: int = 50,
    max_trees: int = 10000,
    tolerance: float | None = None,
    min_leaf: float = 10.0,
    n_bins: int = 64,
    outer_chunk: int = 5,
):
    """gbm.step for ALL outer CV folds at once (the run_cv fast path).

    outer_train_w: (F, n) per-outer-fold training masks.  Returns
    (predictions (F, n) from each fold's best.trees refit, best_trees (F,)).
    Selection semantics per fold are identical to ``fit``; only the
    execution is batched.  Outer folds run in chunks of ``outer_chunk``
    (chunk x n_folds boosting chains per program — one giant program for
    all 100 chains overwhelms the TPU runtime)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    outer_train_w = jnp.asarray(outer_train_w, x.dtype)
    f_outer = outer_train_w.shape[0]
    if tolerance is None:
        # auto tolerance per outer fold: 0.001 x that fold's total mean
        # deviance, exactly as each gbm.step run computes it (V73 "auto")
        wsum = np.maximum(np.asarray(jnp.sum(outer_train_w, axis=1)), 1.0)
        ybar = np.asarray(jnp.sum(outer_train_w * y[None, :], axis=1)) / wsum
        tol_f = np.asarray(
            jnp.sum(outer_train_w * (y[None, :] - jnp.asarray(ybar)[:, None]) ** 2, axis=1)
        ) / wsum
        tolerance = 0.001 * tol_f

    kcv, kfinal = jax.random.split(jax.random.fold_in(key, 11))
    # not jitted as a whole: the cycle loop runs on the host (bounded device
    # programs); each growth cycle is jitted inside
    curve_fn = lambda k, w, tol: _cv_deviance_curve_multi(
        k, x, y, w,
        n_folds=n_folds, n_splits=tree_complexity, lr=learning_rate,
        bag_fraction=bag_fraction, min_leaf=min_leaf, step_size=step_size,
        max_trees=max_trees, tolerance=tol, n_bins=n_bins,
    )
    chunk = max(1, min(outer_chunk, f_outer))
    stopped_parts, cv_parts = [], []
    edges = xb = None
    for s in range(0, f_outer, chunk):
        w_c = outer_train_w[s : s + chunk]
        if w_c.shape[0] < chunk:  # pad to the compiled chunk width
            pad = chunk - w_c.shape[0]
            w_c = jnp.concatenate([w_c, w_c[:pad]], axis=0)
        tol_c = tolerance[s : s + chunk] if isinstance(tolerance, np.ndarray) else tolerance
        if isinstance(tol_c, np.ndarray) and tol_c.shape[0] < chunk:
            tol_c = np.concatenate([tol_c, tol_c[: chunk - tol_c.shape[0]]])
        stopped_c, dev_c, edges, xb = curve_fn(jax.random.fold_in(kcv, s), w_c, tol_c)
        stopped_parts.append(np.asarray(stopped_c))
        cv_parts.append(np.asarray(jnp.mean(dev_c, axis=2)))
    stopped = np.concatenate(stopped_parts)[:f_outer]
    cv_mean = np.concatenate(cv_parts, axis=1)[:, :f_outer]  # (max_cp, F)
    best_trees = np.zeros(f_outer, np.int64)
    for f in range(f_outer):
        j_f = max(int(stopped[f]), 1)
        best_trees[f] = (int(np.argmin(cv_mean[:j_f, f])) + 1) * step_size

    budget = int(-(-best_trees.max() // step_size) * step_size)
    fit_one = jax.jit(
        lambda k, w, nt: brt.fit(
            k, x, y, sample_weight=w,
            n_trees=budget, n_splits=tree_complexity, lr=learning_rate,
            bag_fraction=bag_fraction, min_leaf=min_leaf, n_bins=n_bins,
            n_trees_active=nt, edges=edges, xb=xb,
        )
    )
    finals = jax.vmap(fit_one)(
        jax.random.split(kfinal, f_outer), outer_train_w, jnp.asarray(best_trees)
    )
    # n_splits is static; predict through forest_predict directly so the
    # routing depth stays a Python int under vmap
    from .trees import forest_predict

    predict_all = jax.jit(
        jax.vmap(
            lambda trees, f0, act_lr: f0
            + forest_predict(trees, x, tree_complexity, weights=act_lr)
        )
    )
    preds = predict_all(
        finals.trees, finals.f0, finals.tree_active * finals.lr[:, None]
    )
    return np.asarray(preds), best_trees


def fit(
    key,
    x,
    y,
    *,
    sample_weight=None,
    tree_complexity: int = 5,
    learning_rate: float = 0.001,
    bag_fraction: float = 0.5,
    n_folds: int = 10,
    step_size: int = 50,
    max_trees: int = 10000,
    tolerance: float | None = None,
    min_leaf: float = 10.0,
    n_bins: int = 64,
) -> GBMStepResult:
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    w = as_weight(sample_weight, x.shape[0], x.dtype)
    if tolerance is None:
        # "auto": 0.001 * total mean deviance (variance of y on active rows)
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        ybar = jnp.sum(w * y) / wsum
        tolerance = 0.001 * float(jnp.sum(w * (y - ybar) ** 2) / wsum)

    kcv, kfinal = jax.random.split(jax.random.fold_in(key, 7))
    curve_fn = jax.jit(
        lambda k: _cv_deviance_curve(
            k, x, y, w,
            n_folds=n_folds, n_splits=tree_complexity, lr=learning_rate,
            bag_fraction=bag_fraction, min_leaf=min_leaf, step_size=step_size,
            max_trees=max_trees, tolerance=tolerance, n_bins=n_bins,
        )
    )
    j, dev, _ = curve_fn(kcv)
    j = int(j)
    dev = dev[:j]                                   # (j, k)
    cv_mean = jnp.mean(dev, axis=1)
    cv_se = jnp.std(dev, axis=1, ddof=1) / math.sqrt(n_folds)
    best_cp = int(jnp.argmin(cv_mean))              # first checkpoint at the min
    best_trees = (best_cp + 1) * step_size
    trees_fitted = j * step_size

    # final refit on all rows; budget bucketed to bound recompiles
    budget = max(step_size, -(-best_trees // step_size) * step_size)
    final = brt.fit(
        kfinal, x, y, sample_weight=w,
        n_trees=budget, n_splits=tree_complexity, lr=learning_rate,
        bag_fraction=bag_fraction, min_leaf=min_leaf, n_bins=n_bins,
        n_trees_active=best_trees,
    )
    max_cp = max_trees // step_size
    pad = jnp.full((max_cp,), jnp.inf, x.dtype)
    return GBMStepResult(
        final=final,
        best_trees=best_trees,
        trees_fitted=trees_fitted,
        cv_deviance=pad.at[:j].set(cv_mean),
        cv_deviance_se=pad.at[:j].set(cv_se),
    )


def predict(result: GBMStepResult, x) -> jax.Array:
    return brt.predict(result.final, x)


def importance(result: GBMStepResult, names) -> dict:
    return brt.importance(result.final, names)
