"""gbm.step — CV-based selection of the boosted-tree count.

Re-implements the vendored Elith/Leathwick driver the reference uses for BRT
(machisplin.gbm.step, V73:1660-2239) with its exact selection semantics:

* k-fold selector: rep(1..n_folds) over the rows, randomly shuffled
  (V73:1749-1751), prevalence-stratified for bernoulli (V73:1736-1748);
* per-fold boosting grown in ``step_size``-tree cycles (V73:1884-1967),
  recording mean holdout deviance at each checkpoint; each fold's split
  candidates come from ITS OWN training subset's quantiles (per-fold bin
  edges — the per-fold ``gbm::gbm`` calls see only their subset);
* families gaussian / laplace / poisson / bernoulli (V73:1673, via
  models/families.py) with the driver's manual response transforms
  (V73:1837-1851);
* the "restart with a smaller learning rate" abort when holdout deviance
  rises within the first 4 added cycles (V73:1948-1955) — the reference
  returns NULL and asks the user to restart by hand; this driver AUTOMATES
  the restart (lr/2, up to ``max_restarts`` times) and records it;
* stop when the improvement between the mean of the last 10 checkpoints and
  the overlapping 11-checkpoint window before them drops to ``tolerance``
  (auto = 0.001 x total mean deviance, V73:1957-1961) or ``max_trees``;
* best.trees = the first checkpoint attaining the minimum mean holdout
  deviance (V73:1978-1983);
* final model refit on all rows with best.trees trees (V73:2100-2124), plus
  the reference's CV/self statistics blocks (V73:2014-2096, 2115-2152):
  per-fold deviance/correlation at best.trees with means and SEs, fitted
  values and their between-fold variances, family-correct residuals.

TPU-native: the fold dimension is vmapped inside a single ``lax.while_loop``
over growth cycles, so all 10 fold models advance in lockstep on one chip;
per-checkpoint fold scores are checkpointed into a ring so the CV statistics
at best.trees need no refit; the final refit reuses bucketed static tree
budgets to bound recompiles.
"""
from __future__ import annotations

import functools
import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import brt
from .base import as_weight
from .deviance import calc_deviance
from .families import f0_init, gradient, leaf_adjust, response
from .trees import (
    Tree,
    bin_data,
    grow_bestfirst_tree,
    make_bins,
    make_bins_masked,
)

from ..utils.precision import highest_precision


class GBMStepResult(NamedTuple):
    final: brt.BRTState
    best_trees: int
    trees_fitted: int            # how many trees the CV loop actually grew
    cv_deviance: jax.Array       # (max_checkpoints,) mean holdout deviance (inf = not reached)
    cv_deviance_se: jax.Array    # (max_checkpoints,) between-fold standard errors
    family: str = "gaussian"
    learning_rate: float | None = None   # rate actually used (after restarts)
    restarts: int = 0                    # automated lr/2 restarts (V73:1948-1955)
    selector: np.ndarray | None = None   # (n,) fold membership (keep.fold.vector)
    training_deviance: jax.Array | None = None  # (max_checkpoints,) mean train deviance
    fitted: np.ndarray | None = None     # (n,) final-model fitted values (response scale)
    residuals: np.ndarray | None = None  # (n,) family-correct residuals (V73:2134-2151)
    fitted_vars: np.ndarray | None = None  # (n,) between-fold variance of fitted values
    fold_fit: np.ndarray | None = None   # (n,) held-out linear predictor at best.trees
    self_statistics: dict[str, Any] | None = None  # V73:2190-2192
    cv_statistics: dict[str, Any] | None = None    # V73:2194-2197


# batched bag-draw budget (f32 words): above this the (T, F*K, n) tensor is
# drawn per tree inside the scan instead (bit-identical; see _cycle_program)
_BAG_BATCH_WORDS = int(128e6)


def stopping_fired(mean_curve, tolerance, win: int = 10):
    """The reference's stopping test evaluated at the LAST checkpoint of
    ``mean_curve`` (V73:1957-1961, 1-indexed R): with j checkpoints grown,
    test1 = mean(cv[(j-9):j]) — the last ``win`` checkpoint means — and
    test2 = mean(cv[(j-19):(j-9)]) — the ``win + 1`` checkpoints
    OVERLAPPING test1 at index j-9; the rule fires when
    (test2 - test1) <= tolerance.  Only armed once 2*win checkpoints exist
    (the reference grows 50-tree steps and never tests before j=20).

    mean_curve: (ncp, ...) fold-mean holdout deviance at checkpoints
    1..ncp; tolerance broadcastable over the trailing dims.  Returns (...)
    bool.  Single source of truth for the host-loop bookkeeping in
    ``_cv_deviance_curve_multi`` and the analytic stopping fixture
    (tests/test_parity_invariants.py) — the jitted ``_cv_deviance_curve``
    carries the same arithmetic inside its while_loop cond.
    """
    mean_curve = np.asarray(mean_curve)
    ncp = mean_curve.shape[0]
    if ncp < 2 * win:
        return np.zeros(mean_curve.shape[1:], bool)
    test1 = mean_curve[ncp - win :].mean(axis=0)
    test2 = mean_curve[ncp - 2 * win : ncp - win + 1].mean(axis=0)
    return (test2 - test1) <= tolerance


def best_trees_from_curve(mean_curve, stopped, step_size: int) -> int:
    """best.trees = the first checkpoint attaining the minimum mean holdout
    deviance among the checkpoints grown before stopping (V73:1978-1983).
    ``mean_curve``: (ncp,) fold-mean deviance; ``stopped``: checkpoints grown.
    """
    j_f = max(int(stopped), 1)
    return (int(np.argmin(np.asarray(mean_curve)[:j_f])) + 1) * step_size


def _np_seed(key):
    """numpy seed material from a jax PRNG key (old-style or typed)."""
    try:
        data = jax.random.key_data(key)
    except TypeError:
        data = key
    return np.asarray(data).ravel()


def _make_selector(key, y, w, n_folds, *, family="gaussian", prev_stratify=True):
    """Fold membership, host-side: rep(1..k) shuffled over the active rows
    (V73:1749-1751); prevalence-stratified within presence/absence groups for
    bernoulli (V73:1736-1748).  Inactive rows (w <= 0) receive folds too but
    carry zero weight everywhere downstream."""
    y = np.asarray(y)
    w = np.asarray(w)
    n = y.shape[0]
    rng = np.random.default_rng(_np_seed(key))
    selector = np.zeros(n, np.int32)

    def assign(mask):
        m = int(mask.sum())
        if m == 0:
            return
        temp = (np.arange(m) % n_folds).astype(np.int32)
        selector[mask] = temp[rng.permutation(m)]

    active = w > 0
    if prev_stratify and family == "bernoulli":
        assign(active & (y == 1))
        assign(active & (y == 0))
    else:
        assign(active)
    assign(~active)
    return selector


def _cv_deviance_curve(
    key, x, y, w, selector, *, n_folds, n_splits, lr, bag_fraction, min_leaf,
    step_size, max_trees, tolerance, n_bins, family="gaussian",
    offset=None, monotone=None,
):
    """Fold-vmapped CV deviance curve under one ``lax.while_loop``.

    Returns (j, dev (max_cp, k), tdev (max_cp, k), fhist (max_cp, k, n)) —
    fhist checkpoints every fold's link-scale fit so the CV statistics at
    best.trees need no refit."""
    n, p = x.shape

    fold_ids = jnp.arange(n_folds)
    train_w = (selector[None, :] != fold_ids[:, None]).astype(x.dtype) * w[None, :]
    test_w = (selector[None, :] == fold_ids[:, None]).astype(x.dtype) * w[None, :]
    # per-fold split candidates from each fold's own training subset
    edges_k = jax.vmap(lambda wk: make_bins_masked(x, wk, n_bins))(train_w)  # (k, p, nb-1)
    xb_k = jax.vmap(lambda e: bin_data(x, e))(edges_k)                       # (k, n, p)
    from .trees import flat_bin_onehot

    b1h_k = jax.vmap(lambda q: flat_bin_onehot(q, n_bins))(xb_k)  # shared per fold
    f0 = jax.vmap(lambda wk: f0_init(y, wk, family, offset=offset))(train_w)  # (k,)

    max_cp = max_trees // step_size
    n_total = 2 * n_splits + 1

    def grow_cycle(key_c, f):
        """Advance every fold by step_size trees; f is (k, n) link scale."""

        def tree_step(f, key_t):
            def per_fold(f_k, w_k, xb_f, edges_f, b1h_f, key_k):
                bag = (jax.random.uniform(key_k, (n,)) < bag_fraction).astype(x.dtype) * w_k
                z = gradient(y, f_k, family)
                tree, cur = grow_bestfirst_tree(
                    xb_f, edges_f, z, bag,
                    n_splits=n_splits, min_leaf=min_leaf, return_assign=True,
                    bin1h=b1h_f, monotone=monotone,
                )
                if family != "gaussian":
                    tree = tree._replace(
                        value=leaf_adjust(tree.value, cur, n_total, y, f_k, bag, family)
                    )
                from .trees import assigned_predict

                return f_k + lr * assigned_predict(tree.value, cur, n_total)

            fold_keys = jax.random.split(key_t, n_folds)
            return jax.vmap(per_fold)(f, train_w, xb_k, edges_k, b1h_k, fold_keys), None

        keys = jax.random.split(key_c, step_size)
        f, _ = jax.lax.scan(tree_step, f, keys)
        return f

    def fold_devs(f):
        u = response(f, family)                                  # (k, n)
        dev = jax.vmap(
            lambda uk, twk: calc_deviance(y, uk, weights=twk, family=family)
        )(u, test_w)
        tdev = jax.vmap(
            lambda uk, twk: calc_deviance(y, uk, weights=twk, family=family)
        )(u, train_w)
        return dev, tdev

    win = min(10, max_cp)  # static; the rule only ever fires when j >= 20

    def cond(carry):
        j, f, dev, tdev, fhist, keys_used = carry
        del f, tdev, fhist, keys_used
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
        j, f, dev, tdev, fhist, key_j = carry
        key_j, key_c = jax.random.split(key_j)
        f = grow_cycle(key_c, f)
        d, td = fold_devs(f)
        dev = dev.at[j].set(d)
        tdev = tdev.at[j].set(td)
        fhist = fhist.at[j].set(f)
        return j + 1, f, dev, tdev, fhist, key_j

    f_init = jnp.broadcast_to(f0[:, None], (n_folds, n)).astype(x.dtype)
    if offset is not None:
        f_init = f_init + offset[None, :].astype(x.dtype)
    dev_init = jnp.full((max_cp, n_folds), jnp.inf, x.dtype)
    tdev_init = jnp.full((max_cp, n_folds), jnp.inf, x.dtype)
    fhist_init = jnp.zeros((max_cp, n_folds, n), x.dtype)
    j, _, dev, tdev, fhist, _ = jax.lax.while_loop(
        cond, body, (0, f_init, dev_init, tdev_init, fhist_init, key)
    )
    return j, dev, tdev, fhist


@functools.lru_cache(maxsize=32)
def _cycle_program(*, n_splits, lr, bag_fraction, min_leaf, step_size,
                   n_cycles=1, with_fhist=False, shared_bins=False,
                   global_bins=False, mesh=None):
    """``n_cycles`` jitted growth cycles for the batched CV curve: advances
    every (outer, inner) boosting chain by n_cycles x step_size trees and
    returns the per-cycle holdout deviances (n_cycles, F, K).  Cached so
    repeated chunks/calls reuse the compiled program; run as a bounded
    device program because a whole-curve while_loop trips the remote
    runtime's program watchdog at this batch width.  Batching a few cycles
    per dispatch amortises the host round-trip; the key chain inside
    reproduces the host loop's split(key_j) sequence exactly, so results
    are bit-identical to single-cycle dispatching.

    ``with_fhist``: additionally return per-cycle training deviances and
    the checkpointed link-scale fits (n_cycles, F, K, n) — the inputs the
    gbm.step CV-statistics block needs (fit_multi's statistics path).  Off
    by default: the extra device->host traffic is pure overhead on the
    run_cv hot path."""

    @jax.jit
    def cycle(key_j, fmat, xb, edges, x, y, train_w, test_w, test_sum):
        # xb / edges: with shared_bins=False every (outer, inner) chain bins
        # on ITS OWN training subset's quantiles (per-fold gbm calls):
        # xb (F, K, n, p), edges (F, K, p, nb-1).  With shared_bins=True the
        # K inner chains of each outer fold share the OUTER subset's
        # quantiles — xb (F, n, p), edges (F, p, nb-1) — so each split
        # step's histogram contraction reads each one-hot ONCE for a
        # (4K, n) A-side instead of K times (the split step is HBM-bound on
        # those reads; round-5 CV_LETTERS).  y is (F, n): outer chains may
        # carry DIFFERENT responses, so one program serves every
        # (response, outer-fold) pair at once.
        f_outer, n_folds, n = fmat.shape
        from .trees import flat_bin_onehot

        nb = int(edges.shape[-1]) + 1
        if global_bins:
            # ONE split-candidate table for EVERY chain (xb (n, p), edges
            # (p, nb-1) from full-data quantiles): all F x K chains ride a
            # single fused Pallas tree kernel per boosting step — one
            # launch instead of the ~1100 latency-bound XLA ops the round-5
            # SPLIT_STEP_ABLATION attributed the CV wall to.  See
            # fit_outer_batched's global_bins deviation note.
            from ..ops.pallas_grow import gbm_tree_update
            from .trees import flat_bin_cum_onehot

            cum1h = flat_bin_cum_onehot(xb, nb)               # (n, p*nb) bf16
            xbt = xb.T.astype(x.dtype)                        # (p, n)
            y_flat = jnp.broadcast_to(
                y[:, None, :], (f_outer, n_folds, n)
            ).reshape(f_outer * n_folds, n)

            def update(xt, c1h, yf, ff, bf):
                return gbm_tree_update(
                    xt, c1h, yf, ff, bf,
                    n_splits=n_splits, nb=nb, min_leaf=min_leaf, lr=lr,
                )

            if mesh is not None:
                from jax.sharding import PartitionSpec as P

                ax = mesh.axis_names[0]
                # each device grows its own chains' trees (chains are
                # independent; xbt/cum1h replicate)
                update = jax.shard_map(
                    update, mesh=mesh,
                    in_specs=(P(), P(), P(ax), P(ax), P(ax)), out_specs=P(ax),
                )

            def per_tree_bag(key_t):
                kf = jax.random.split(key_t, f_outer)
                u = jax.vmap(
                    lambda k: jax.random.uniform(k, (n_folds, n))
                )(kf)                                         # (F, K, n)
                return ((u < bag_fraction).astype(x.dtype) * train_w
                        ).reshape(f_outer * n_folds, n)

            def draw_bags(keys):
                # ALL of a cycle's bag draws in ONE batched threefry
                # dispatch — the per-tree split+uniform chains were ~half
                # of what remained outside the kernel.  Values are
                # bit-identical to per-tree draws (threefry is a pure
                # function of the key): vmap over the scan's tree keys of
                # the shared_bins path's per-outer draw.
                return jax.vmap(per_tree_bag)(keys)           # (T, F*K, n)

            # the batched (T, F*K, n) bag tensor is ~4 GB at config-3 scale
            # (50 x 200 x 10k); above ~0.5 GB draw each tree's bag inside
            # the scan instead — bit-identical (threefry is a pure function
            # of the key), just without the one-dispatch latency win
            batch_bags = (
                step_size * f_outer * n_folds * n <= _BAG_BATCH_WORDS
            )

            def tree_step(fm, bag_or_key):
                bag_t = bag_or_key if batch_bags else per_tree_bag(bag_or_key)
                fm_new = update(xbt, cum1h, y_flat, fm, bag_t)
                return fm_new, None

        elif shared_bins:
            from .trees import assigned_predict_batched, grow_bestfirst_trees_shared

            b1h = jax.vmap(lambda q: flat_bin_onehot(q, nb))(xb)  # (F, n, p*nb)

            def tree_step(fm, key_t):
                def per_outer(f_f, y_f, w_f, xb_f, b1h_f, key_f):
                    # f_f (K, n): all K inner chains of this outer fold
                    bag = (
                        jax.random.uniform(key_f, (n_folds, n)) < bag_fraction
                    ).astype(x.dtype) * w_f
                    value, cur = grow_bestfirst_trees_shared(
                        xb_f, y_f[None, :] - f_f, bag,
                        n_splits=n_splits, min_leaf=min_leaf, bin1h=b1h_f,
                    )
                    return f_f + lr * assigned_predict_batched(
                        value, cur, 2 * n_splits + 1
                    )

                keys = jax.random.split(key_t, f_outer)
                return jax.vmap(per_outer)(fm, y, train_w, xb, b1h, keys), None

        else:
            xb_flat = xb.reshape((f_outer * n_folds,) + xb.shape[2:])
            # one bf16 one-hot per chain, shared by EVERY tree this dispatch
            b1h = jax.vmap(lambda q: flat_bin_onehot(q, nb))(xb_flat)

            def tree_step(fm, key_t):
                def per_model(f_k, y_k, w_k, xb_k, edges_k, b1h_k, key_k):
                    bag = (jax.random.uniform(key_k, (n,)) < bag_fraction).astype(x.dtype) * w_k
                    tree, cur = grow_bestfirst_tree(
                        xb_k, edges_k, y_k - f_k, bag,
                        n_splits=n_splits, min_leaf=min_leaf, return_assign=True,
                        bin1h=b1h_k,
                    )
                    # training-row prediction from the grower's own assignment —
                    # no tree_predict gather walk (see grow_bestfirst_tree doc)
                    from .trees import assigned_predict

                    return f_k + lr * assigned_predict(tree.value, cur, 2 * n_splits + 1)

                # single-level vmap over the flattened (outer x inner) axis —
                # nested vmaps of the tree grower have faulted the TPU runtime
                keys = jax.random.split(key_t, f_outer * n_folds)
                y_flat = jnp.broadcast_to(y[:, None, :], (f_outer, n_folds, n))
                flat = jax.vmap(per_model)(
                    fm.reshape(f_outer * n_folds, n),
                    y_flat.reshape(f_outer * n_folds, n),
                    train_w.reshape(f_outer * n_folds, n),
                    xb_flat,
                    edges.reshape((f_outer * n_folds,) + edges.shape[2:]),
                    b1h,
                    keys,
                )
                return flat.reshape(f_outer, n_folds, n), None

        train_sum = jnp.maximum(jnp.sum(train_w, axis=2), 1.0) if with_fhist else None

        def one_cycle(carry, _):
            fm, kj = carry
            kj, key_c = jax.random.split(kj)
            keys = jax.random.split(key_c, step_size)
            if global_bins:
                xs_scan = draw_bags(keys) if batch_bags else keys
                fm_flat, _ = jax.lax.scan(
                    tree_step, fm.reshape(f_outer * n_folds, n), xs_scan
                )
                fm = fm_flat.reshape(f_outer, n_folds, n)
            else:
                fm, _ = jax.lax.scan(tree_step, fm, keys)
            dev = jnp.sum(test_w * (y[:, None, :] - fm) ** 2, axis=2) / test_sum
            if with_fhist:
                tdev = jnp.sum(train_w * (y[:, None, :] - fm) ** 2, axis=2) / train_sum
                return (fm, kj), (dev, tdev, fm)
            return (fm, kj), dev

        (fmat, key_j), devs = jax.lax.scan(
            one_cycle, (fmat, key_j), None, length=n_cycles
        )
        return fmat, key_j, devs

    return cycle


def _chain_sharding(mesh, ndim):
    """NamedSharding putting the leading (outer-chain) axis on the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(mesh.axis_names[0], *([None] * (ndim - 1))))


class MultiCurve(NamedTuple):
    stopped: jax.Array            # (F,) stopping checkpoint per chain
    dev: jax.Array                # (max_cp, F, K) holdout deviance (inf pad)
    edges: jax.Array              # (F, K, p, nb-1) bin edges; (F, p, nb-1) shared_bins
    xb: jax.Array                 # (F, K, n, p) binned data; (F, n, p) shared_bins
    tdev: Any = None              # (max_cp, F, K) train deviance (keep_fhist)
    fhist: Any = None             # (max_cp, F, K, n) link fits (keep_fhist)


def _cv_deviance_curve_multi(
    key, x, y, w_outer, *, n_folds, n_splits, lr, bag_fraction, min_leaf,
    step_size, max_trees, tolerance, n_bins, mesh=None, selectors=None,
    keep_fhist=False, shared_bins=False, global_bins=False,
):
    """All OUTER folds' gbm.step CV curves, batched.

    w_outer: (F, n) training masks (one per outer CV fold).  ``y`` is (n,)
    shared, or (F, n) with a response PER OUTER CHAIN — so multiple response
    variables' gbm.step runs batch into the same programs.  Every outer
    fold's inner-fold models advance in lockstep — F x K boosting chains per
    tree step — in bounded jitted cycle programs with the checkpoint/stop
    bookkeeping on the host; each outer fold freezes at its own stopping
    checkpoint (the reference's rule applied per gbm.step run).  Returns
    a MultiCurve (stopping checkpoints, deviance curves, per-chain edges/xb;
    plus train deviances and checkpointed fold fits when ``keep_fhist``).

    ``selectors``: optional (F, n) fold memberships; when omitted they are
    drawn on-device (argsort of uniforms — a different RNG stream than
    ``fit``'s host ``_make_selector``, statistically equivalent).

    ``mesh``: device mesh — the outer-chain axis F shards across it (F must
    divide the mesh size; fit_outer_batched pads its chunks accordingly).
    Chains are independent, so the sharded program is the single-device
    program in a different layout: results are identical.  This is the
    multi-chip path for the pipeline's dominant phase (the reference's HOT
    LOOP #1, V73:225-319 — the loop its dead snowfall fan-out targeted,
    old/...V69.R:936-969)."""
    n, p = x.shape
    f_outer = w_outer.shape[0]
    y = jnp.asarray(y)
    if y.ndim == 1:
        y = jnp.broadcast_to(y[None, :], (f_outer, n))

    kfold, kboost = jax.random.split(key)

    if selectors is None:

        def selector_for(kf, w):
            order = jnp.argsort(jax.random.uniform(kf, (n,)) + (w <= 0) * 10.0)
            seq = (jnp.arange(n) % n_folds).astype(jnp.int32)
            return jnp.zeros((n,), jnp.int32).at[order].set(seq)

        selectors = jax.vmap(selector_for)(jax.random.split(kfold, f_outer), w_outer)
    else:
        selectors = jnp.asarray(selectors, jnp.int32)
    fold_ids = jnp.arange(n_folds)
    train_w = (
        (selectors[:, None, :] != fold_ids[None, :, None]).astype(x.dtype)
        * w_outer[:, None, :]
    )                                                        # (F, K, n)
    test_w = (
        (selectors[:, None, :] == fold_ids[None, :, None]).astype(x.dtype)
        * w_outer[:, None, :]
    )
    if global_bins:
        # ONE candidate table from FULL-data quantiles for every chain:
        # the layout the fused Pallas tree kernel rides (see
        # fit_outer_batched's deviation note and ops/pallas_grow.py)
        edges = make_bins(x, n_bins)                          # (p, nb-1)
        xb = bin_data(x, edges)                               # (n, p)
    elif shared_bins:
        # split candidates from each OUTER chain's training subset, shared
        # by its K inner chains (the shared_bins deviation: ~K x less
        # one-hot HBM traffic per split step; see grow_bestfirst_trees_shared)
        edges = jax.vmap(lambda wf: make_bins_masked(x, wf, n_bins))(w_outer)
        xb = jax.vmap(lambda e: bin_data(x, e))(edges)        # (F, n, p)
    else:
        # per-(outer, inner) split candidates from each chain's training subset
        edges = jax.vmap(jax.vmap(lambda wk: make_bins_masked(x, wk, n_bins)))(train_w)
        xb = jax.vmap(jax.vmap(lambda e: bin_data(x, e)))(edges)  # (F, K, n, p)
    test_sum = jnp.maximum(jnp.sum(test_w, axis=2), 1.0)     # (F, K)
    train_sum = jnp.maximum(jnp.sum(train_w, axis=2), 1.0)
    f0 = jnp.sum(train_w * y[:, None, :], axis=2) / train_sum

    max_cp = max_trees // step_size
    win = min(10, max_cp)

    # a few cycles per device dispatch amortise the tunnel round trip; the
    # stop rule is evaluated retrospectively at every checkpoint inside the
    # batch, so stopping points are identical (any over-grown cycles merely
    # waste a little compute — downstream slices each fold's curve at its
    # exact stopping checkpoint)
    n_cyc = 5
    cycle_fn = _cycle_program(
        n_splits=n_splits, lr=lr, bag_fraction=bag_fraction,
        min_leaf=min_leaf, step_size=step_size, n_cycles=n_cyc,
        with_fhist=keep_fhist, shared_bins=shared_bins,
        global_bins=global_bins, mesh=mesh,
    )
    fmat = jnp.broadcast_to(f0[:, :, None], (f_outer, n_folds, n)).astype(x.dtype)
    if mesh is not None:
        # commit every F-leading operand to a chain-sharded layout; the jitted
        # cycle program propagates the sharding (each device advances its
        # share of the boosting chains, no collectives needed)
        shard = lambda a: jax.device_put(a, _chain_sharding(mesh, a.ndim))
        fmat, train_w, test_w, test_sum, y = map(
            shard, (fmat, train_w, test_w, test_sum, y)
        )
        from jax.sharding import NamedSharding, PartitionSpec as P

        x = jax.device_put(x, NamedSharding(mesh, P()))  # replicate rows
        if global_bins:
            # the global candidate table replicates (every chain shares it)
            xb = jax.device_put(xb, NamedSharding(mesh, P()))
            edges = jax.device_put(edges, NamedSharding(mesh, P()))
        else:
            xb, edges = map(shard, (xb, edges))
    dev = np.full((max_cp, f_outer, n_folds), np.inf, np.float64)
    # fhist/tdev live on the host as per-dispatch float32 chunks (only up to
    # the last dispatched checkpoint — stops are usually far below max_cp)
    tdev_chunks: list = []
    fhist_chunks: list = []
    stopped = np.full((f_outer,), max_cp + 1, np.int64)
    key_j = kboost
    j = 0
    while j < max_cp and np.any(stopped > max_cp):
        fmat, key_j, dev_c = cycle_fn(
            key_j, fmat, xb, edges, x, y, train_w, test_w, test_sum
        )
        if keep_fhist:
            dev_c, tdev_c, fh_c = dev_c
            c_keep = min(n_cyc, max_cp - j)
            tdev_chunks.append(np.asarray(tdev_c, np.float32)[:c_keep])
            fhist_chunks.append(np.asarray(fh_c, np.float32)[:c_keep])
        c_here = min(n_cyc, max_cp - j)
        dev[j : j + c_here] = np.asarray(dev_c)[:c_here]
        for jj in range(j, j + c_here):
            fire = stopping_fired(
                dev[: jj + 1].mean(axis=2), tolerance, win=win
            ) & (stopped > max_cp)
            stopped[fire] = jj + 1
        j += c_here
    stopped = np.minimum(stopped, j)
    tdev_out = np.concatenate(tdev_chunks) if tdev_chunks else None
    fhist_out = np.concatenate(fhist_chunks) if fhist_chunks else None
    return MultiCurve(
        jnp.asarray(stopped), jnp.asarray(dev, x.dtype), edges, xb,
        tdev_out, fhist_out,
    )


def _final_fits_global(
    keys, x, ycols, best_trees, *, budget, n_splits, lr_vec, bag_fraction,
    min_leaf, n_bins, sample_w=None, mesh=None, with_deviance=False,
    emit_trees=False,
):
    """All chains' gaussian final BRT refits on the fused Pallas grower.

    The kernel-era replacement for the vmapped ``brt.fit`` refits (the
    round-5 attribution: with the CV curve on the kernel, the refits were
    ~85% of letter b's remaining wall).  One fused launch per tree advances
    every chain — outer folds for fit_outer_batched, responses for
    fit_multi — under GLOBAL full-data bins (same deviation note as
    fit_outer_batched's ``global_bins``):

    * per-chain learning rates (fit_multi's lr/2 restarts) apply OUTSIDE
      the kernel — it grows at lr=1 and the driver takes
      ``f += lr_c * act_c * (f_new - f)``, which also implements
      brt.fit's n_trees_active bucketing exactly (inactive trees still
      train on the frozen residuals, contribute nothing);
    * bag draws are bit-identical to the vmapped brt.fit stream (the same
      per-chain ``split(key, budget)`` key chains);
    * ``emit_trees`` returns the stacked flat tree arrays (budget, C, .)
      — feat/thr_bin/internal/left/right/value/var_gain — for forests
      that must predict rasters and report importances (V73:493/519).

    Returns a dict: f0 (C,), train_fit (C, n), tree_active (C, budget);
    + trees' arrays when ``emit_trees``; + train/holdout deviance paths
    (C, budget) when ``with_deviance``.
    """
    from ..ops.pallas_grow import gbm_tree_update
    from .trees import flat_bin_cum_onehot

    x = jnp.asarray(x)
    n, p = x.shape
    ycols = jnp.asarray(ycols, x.dtype)
    c_real = ycols.shape[0]
    w = (
        jnp.ones((c_real, n), x.dtype)
        if sample_w is None else jnp.asarray(sample_w, x.dtype)
    )
    best_trees = jnp.asarray(best_trees)
    lr_vec = jnp.asarray(lr_vec)
    keys = jnp.asarray(keys)
    if mesh is not None:
        # the shard_mapped chain axis must divide the mesh: tile the
        # chains up (padded chains compute, their rows are sliced off)
        n_dev = int(np.prod(mesh.devices.shape))
        c_pad_to = -(-c_real // n_dev) * n_dev
        if c_pad_to > c_real:
            reps = -(-c_pad_to // c_real)
            tile = lambda a: jnp.concatenate([a] * reps, axis=0)[:c_pad_to]
            ycols, w, best_trees, lr_vec, keys = map(
                tile, (ycols, w, best_trees, lr_vec, keys)
            )
    c_chains = ycols.shape[0]
    edges = make_bins(x, n_bins)
    xb = bin_data(x, edges)
    cum1h = flat_bin_cum_onehot(xb, n_bins)
    xbt = xb.T.astype(x.dtype)
    lr_col = jnp.asarray(lr_vec, x.dtype)[:, None]
    bt = jnp.asarray(best_trees)
    wsum = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    f0 = jnp.sum(w * ycols, axis=1) / wsum                 # gaussian f0_init
    test_w = (w <= 0).astype(x.dtype)
    test_sum = jnp.maximum(jnp.sum(test_w, axis=1), 1.0)

    def update(xt, c1, yf, ff, bf):
        return gbm_tree_update(
            xt, c1, yf, ff, bf, n_splits=n_splits, nb=n_bins,
            min_leaf=min_leaf, lr=1.0, emit_tree=emit_trees,
        )

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        ax = mesh.axis_names[0]
        update = jax.shard_map(
            update, mesh=mesh, in_specs=(P(), P(), P(ax), P(ax), P(ax)),
            out_specs=((P(ax),) * 8 if emit_trees else P(ax)),
        )

    # same key chains as vmap(brt.fit): split(chain key, budget)
    keys_ct = jax.vmap(lambda k: jax.random.split(k, budget))(keys)
    keys_tc = jnp.swapaxes(keys_ct, 0, 1)                  # (budget, C)
    act = (jnp.arange(budget)[None, :] < bt[:, None]).astype(x.dtype)

    @jax.jit
    def run(ycols, w, f0, act_tc, keys_tc):
        def step(f, inp):
            keys_t, act_t = inp
            bag = (
                jax.vmap(lambda kk: jax.random.uniform(kk, (n,)))(keys_t)
                < bag_fraction
            ).astype(x.dtype) * w
            out = update(xbt, cum1h, ycols, f, bag)
            f_new = out[0] if emit_trees else out
            f = f + lr_col * act_t[:, None] * (f_new - f)
            ys_out = tuple(out[1:]) if emit_trees else ()
            if with_deviance:
                td = jnp.sum(w * (ycols - f) ** 2, axis=1) / wsum
                hd = jnp.sum(test_w * (ycols - f) ** 2, axis=1) / test_sum
                ys_out = ys_out + (td, hd)
            return f, (ys_out if ys_out else None)

        f_init = jnp.broadcast_to(f0[:, None], (c_chains, n)).astype(x.dtype)
        return jax.lax.scan(step, f_init, (keys_tc, act_tc))

    f_fin, outs = run(ycols, w, f0, act.T, keys_tc)
    res = dict(
        f0=f0[:c_real], train_fit=f_fin[:c_real], tree_active=act[:c_real],
        edges=edges,
    )
    if emit_trees:
        for name, o in zip(
            ("feat", "thr_bin", "internal", "left", "right", "value",
             "var_gain"), outs[:7],
        ):
            res[name] = o[:, :c_real]                    # (budget, C, .)
        outs = outs[7:]
    if with_deviance:
        res["train_deviance"] = outs[0][:, :c_real]
        res["holdout_deviance"] = outs[1][:, :c_real]
    return res


@highest_precision
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
    outer_chunk: int = 20,
    mesh=None,
    shared_bins: bool = True,
    global_bins: bool = True,
):
    """gbm.step for ALL outer CV folds at once (the run_cv fast path;
    gaussian only — the only family mltps's CV uses, V73:247).

    ``global_bins`` (default True): every chain's split candidates come
    from ONE table of full-data quantiles, so all F x K boosting chains
    grow their trees in a single fused Pallas kernel launch per step
    (ops/pallas_grow.py) — the round-5 fix for the CV phase being
    op-launch-latency-bound (SPLIT_STEP_ABLATION: 124 of 136 us per split
    was ~25 tiny serialised XLA ops).  Deviation ladder: R's gbm splits on
    exact raw values of each fold's own subset; our binning is already a
    64-bin quantile approximation (LightGBM-style), and candidates from
    100% vs 90% of the rows are near-identical quantiles — split QUALITY
    is unaffected, near-tie selections can differ.  ``global_bins=False``
    falls back to ``shared_bins``.

    ``shared_bins``: the K inner chains of each outer fold share split
    candidates from the OUTER training subset's quantiles instead of each
    inner fold's own 90% — ~K x less one-hot HBM traffic per split step.
    ``shared_bins=False`` too restores per-inner-fold quantiles (rounds
    1-4 behavior).

    ``mesh``: device mesh — the outer-chain axis shards across it (chunks
    round up to the mesh size; chains are independent so results match the
    single-device run exactly).  See _cv_deviance_curve_multi.

    outer_train_w: (F, n) per-outer-fold training masks; ``y`` is (n,)
    shared or (F, n) per chain — so SEVERAL RESPONSE VARIABLES' gbm.step
    runs batch into the same device programs (each (response, outer-fold)
    pair is just another chain).  Returns (predictions (F, n) from each
    fold's best.trees refit, best_trees (F,)).  Selection RULES per fold
    (windows, tolerance, best.trees argmin) are identical to ``fit``, but
    the inner-fold memberships come from a different RNG stream (on-device
    argsort here vs ``fit``'s host ``_make_selector``) — statistically
    equivalent, not bit-identical.  Outer
    chains run in chunks of ``outer_chunk`` (chunk x n_folds boosting
    chains per program; all 100 chains fit in one program now that the
    growth cycle is gather-free — the old gather-heavy version overwhelmed
    the TPU runtime at this width)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    outer_train_w = jnp.asarray(outer_train_w, x.dtype)
    f_outer = outer_train_w.shape[0]
    if y.ndim == 1:
        y = jnp.broadcast_to(y[None, :], (f_outer, y.shape[0]))
    if tolerance is None:
        # auto tolerance per outer fold: 0.001 x that fold's total mean
        # deviance, exactly as each gbm.step run computes it (V73 "auto")
        wsum = np.maximum(np.asarray(jnp.sum(outer_train_w, axis=1)), 1.0)
        ybar = np.asarray(jnp.sum(outer_train_w * y, axis=1)) / wsum
        tol_f = np.asarray(
            jnp.sum(outer_train_w * (y - jnp.asarray(ybar)[:, None]) ** 2, axis=1)
        ) / wsum
        tolerance = 0.001 * tol_f

    kcv, kfinal = jax.random.split(jax.random.fold_in(key, 11))
    # not jitted as a whole: the cycle loop runs on the host (bounded device
    # programs); each growth cycle is jitted inside
    curve_fn = lambda k, yc, w, tol: _cv_deviance_curve_multi(
        k, x, yc, w,
        n_folds=n_folds, n_splits=tree_complexity, lr=learning_rate,
        bag_fraction=bag_fraction, min_leaf=min_leaf, step_size=step_size,
        max_trees=max_trees, tolerance=tol, n_bins=n_bins, mesh=mesh,
        shared_bins=shared_bins, global_bins=global_bins,
    )
    n_dev = 1 if mesh is None else int(np.prod(mesh.devices.shape))
    chunk = max(1, min(outer_chunk, f_outer))
    chunk = -(-chunk // n_dev) * n_dev  # sharded chain axis must divide the mesh
    stopped_parts, cv_parts = [], []
    for s in range(0, f_outer, chunk):
        w_c = outer_train_w[s : s + chunk]
        y_c = y[s : s + chunk]
        if w_c.shape[0] < chunk:  # tile the remainder up to the compiled chunk
            # width (a single [:pad] slice under-pads when the remainder is
            # smaller than the deficit, forcing a fresh multi-minute compile)
            reps = -(-chunk // w_c.shape[0])
            w_c = jnp.tile(w_c, (reps, 1))[:chunk]
            y_c = jnp.tile(y_c, (reps, 1))[:chunk]
        tol_c = tolerance[s : s + chunk] if isinstance(tolerance, np.ndarray) else tolerance
        if isinstance(tol_c, np.ndarray) and tol_c.shape[0] < chunk:
            tol_c = np.resize(tol_c, chunk)
        curve = curve_fn(jax.random.fold_in(kcv, s), y_c, w_c, tol_c)
        stopped_parts.append(np.asarray(curve.stopped))
        cv_parts.append(np.asarray(jnp.mean(curve.dev, axis=2)))
    stopped = np.concatenate(stopped_parts)[:f_outer]
    cv_mean = np.concatenate(cv_parts, axis=1)[:, :f_outer]  # (max_cp, F)
    best_trees = np.zeros(f_outer, np.int64)
    for f in range(f_outer):
        best_trees[f] = best_trees_from_curve(cv_mean[:, f], stopped[f], step_size)

    budget = int(-(-best_trees.max() // step_size) * step_size)
    if global_bins:
        # kernel refits under the same global candidate table as the curve
        # (_final_fits_global tiles the chain axis up to the mesh itself)
        res = _final_fits_global(
            jax.random.split(kfinal, f_outer), x, y,
            jnp.asarray(best_trees), budget=budget,
            n_splits=tree_complexity, lr_vec=np.full(f_outer, learning_rate),
            bag_fraction=bag_fraction, min_leaf=min_leaf, n_bins=n_bins,
            sample_w=outer_train_w, mesh=mesh,
        )
        return np.asarray(res["train_fit"]), best_trees
    # each outer fold's final refit bins on ITS training subset's quantiles
    edges_f = jax.vmap(lambda wf: make_bins_masked(x, wf, n_bins))(outer_train_w)
    xb_f = jax.vmap(lambda e: bin_data(x, e))(edges_f)
    fit_one = jax.jit(
        lambda k, yf, w, nt, e, xbk: brt.fit(
            k, x, yf, sample_weight=w,
            n_trees=budget, n_splits=tree_complexity, lr=learning_rate,
            bag_fraction=bag_fraction, min_leaf=min_leaf, n_bins=n_bins,
            n_trees_active=nt, edges=e, xb=xbk,
        )
    )
    f_pad = f_outer if mesh is None else -(-f_outer // n_dev) * n_dev
    # threefry split is prefix-stable: rows [:f_outer] match the unpadded call
    keys_f = jax.random.split(kfinal, f_pad)
    refit_args = (keys_f, y, outer_train_w, jnp.asarray(best_trees), edges_f, xb_f)
    if mesh is not None:
        reps = -(-f_pad // f_outer)

        def pad_shard(a):
            if f_pad > a.shape[0]:
                a = jnp.tile(a, (reps,) + (1,) * (a.ndim - 1))[:f_pad]
            return jax.device_put(a, _chain_sharding(mesh, a.ndim))

        refit_args = tuple(map(pad_shard, refit_args))
    finals = jax.vmap(fit_one)(*refit_args)
    # training-row predictions come straight from each final fit's scan
    # carry (active-tree mask already applied) — no forest routing pass
    return np.asarray(finals.train_fit)[:f_outer], best_trees


def _cv_statistics_at_best(fbest, y_np, w_np, selector_np, n_folds, family):
    """The reference's cv.statistics block at best.trees (V73:2014-2096):
    per-fold heldout deviance/correlation with means and SEs, between-fold
    fitted-value variances, and the heldout linear predictors.  Shared by
    ``fit`` and ``fit_multi``."""
    ubest = np.asarray(response(jnp.asarray(fbest), family))   # response scale
    n = y_np.shape[0]
    cv_dev_stats = np.zeros(n_folds)
    cv_cor_stats = np.zeros(n_folds)
    fold_fit = np.zeros(n)
    for i in range(n_folds):
        held = (selector_np == i) & (w_np > 0)
        cv_dev_stats[i] = float(
            calc_deviance(y_np[held], ubest[i, held], weights=w_np[held], family=family)
        )
        yi, ui = y_np[held], ubest[i, held]
        cv_cor_stats[i] = (
            float(np.corrcoef(yi, ui)[0, 1]) if held.sum() > 1 and np.std(ui) > 0 else np.nan
        )
        fold_fit[held] = fbest[i, held]
    fitted_vars = np.var(ubest, axis=0, ddof=1)
    cv_statistics = {
        "deviance.mean": float(np.nanmean(cv_dev_stats)),
        "deviance.se": float(np.nanstd(cv_dev_stats, ddof=1) / math.sqrt(n_folds)),
        "correlation.mean": float(np.nanmean(cv_cor_stats)),
        "correlation.se": float(np.nanstd(cv_cor_stats, ddof=1) / math.sqrt(n_folds)),
        "deviance.stats": cv_dev_stats,
        "correlation.stats": cv_cor_stats,
    }
    return cv_statistics, fitted_vars, fold_fit


def _self_statistics(fitted_link, y_np, w_np, family, total_deviance, n_active):
    """The reference's self.statistics block and family-correct residuals
    of the final model (V73:2115-2152, 2190-2192).  Shared by ``fit`` and
    ``fit_multi``."""
    fitted = np.asarray(response(jnp.asarray(fitted_link), family))
    resid_deviance = float(
        calc_deviance(y_np, jnp.asarray(fitted), weights=w_np, family=family,
                      calc_mean=False)
    )
    if family == "bernoulli":
        contribs = y_np * np.log(np.maximum(fitted, 1e-12)) + (1 - y_np) * np.log(
            np.maximum(1 - fitted, 1e-12)
        )
        residuals = np.sqrt(np.abs(contribs * 2.0))
        residuals = np.where(y_np - fitted < 0, -residuals, residuals)
    elif family == "poisson":
        contribs = np.where(
            y_np == 0, 0.0, y_np * np.log(np.maximum(y_np, 1e-12) / np.maximum(fitted, 1e-12))
        ) - (y_np - fitted)
        residuals = np.sqrt(np.abs(contribs * 2.0))
        residuals = np.where(y_np - fitted < 0, -residuals, residuals)
    else:  # gaussian | laplace
        residuals = y_np - fitted
    with np.errstate(invalid="ignore"):
        self_cor = float(np.corrcoef(y_np[w_np > 0], fitted[w_np > 0])[0, 1])
    self_statistics = {
        "null": total_deviance,
        "mean.null": total_deviance / n_active,
        "resid": resid_deviance,
        "mean.resid": resid_deviance / n_active,
        "correlation": self_cor,
    }
    return fitted, residuals, self_statistics


@highest_precision
def fit_multi(
    keys,
    x,
    ycols,
    *,
    tree_complexity: int = 5,
    learning_rate: float = 0.001,
    bag_fraction: float = 0.5,
    n_folds: int = 10,
    step_size: int = 50,
    max_trees: int = 10000,
    tolerance: float | None = None,
    min_leaf: float = 10.0,
    n_bins: int = 64,
    max_restarts: int = 3,
    statistics: bool = False,
    mesh=None,
    shared_bins: bool = True,
    global_bins: bool = True,
) -> list:
    """gbm.step final fits for SEVERAL responses batched into one device
    program sequence (gaussian, unweighted rows — mltps's final-fit case,
    V73:447/493).  The pipeline's last O(R) part-2 block becomes O(1)
    dispatch sequences: every response's 10 inner-fold boosting chains
    advance in the same bounded cycle programs (R x K chains), stopping
    decisions/restarts resolve per response on the host, and the final
    refits run as ONE vmapped program with tree budgets padded to the
    bucketed max best.trees (later trees train but contribute nothing —
    ``n_trees_active``).

    ``keys``: (R,) per-response PRNG keys — the same keys the serial
    ``fit`` loop would receive, so each response's fold selector matches
    its serial twin exactly (host ``_make_selector`` from the same ksel).
    Bag draws ride the batched curve's shared key chain instead of the
    serial per-response chain: the fits are statistically equivalent, not
    bit-identical (the test_pipeline batched-final-fit caveat).

    The lr/2 restart rule (V73:1948-1955) applies per response: responses
    whose holdout deviance rises within the first 4 cycles re-enter the
    next batched curve at half their rate; groups are keyed by current lr
    so restarted responses batch together.

    ``shared_bins`` (default True): each response's K inner chains share
    split candidates binned on the FULL data (w == 1 here, so the "outer
    subset" is all rows) — see ``fit_outer_batched`` for the rationale and
    the deviation note; False restores per-inner-fold quantiles.

    ``statistics=False`` (default) skips the CV/self statistics blocks —
    they checkpoint every fold fit through the device->host link (pure
    overhead on the pipeline path, which only consumes ``final`` and the
    importance reporter).  With ``statistics=True`` every GBMStepResult
    field is filled exactly as ``fit`` fills it.

    Returns a list of R GBMStepResult, indexed like ``ycols``' columns.
    """
    x = jnp.asarray(x)
    ycols = jnp.asarray(ycols)
    n, p = x.shape
    n_resp = int(ycols.shape[1])
    y_np_all = np.asarray(ycols)
    w_np = np.ones(n)

    # per-response scalars exactly as the serial fit computes them
    selectors = np.zeros((n_resp, n), np.int32)
    kcvs, kfinals = [], []
    total_dev = np.zeros(n_resp)
    for j in range(n_resp):
        ksel, kcv, kfinal = jax.random.split(jax.random.fold_in(keys[j], 7), 3)
        yj = y_np_all[:, j]
        total_dev[j] = float(np.sum((yj - yj.mean()) ** 2))
        selectors[j] = _make_selector(ksel, yj, w_np, n_folds)
        kcvs.append(kcv)
        kfinals.append(kfinal)
    tol = (
        0.001 * total_dev / n if tolerance is None else np.full(n_resp, tolerance)
    )

    max_cp = max_trees // step_size
    lr_used = np.full(n_resp, float(learning_rate))
    restarts = np.zeros(n_resp, np.int64)
    done: dict[int, dict] = {}
    pending = list(range(n_resp))
    n_dev = 1 if mesh is None else int(np.prod(mesh.devices.shape))
    while pending:
        lr_g = lr_used[pending[0]]
        group = [j for j in pending if lr_used[j] == lr_g]
        f_g = len(group)
        f_pad = -(-f_g // n_dev) * n_dev
        idx = (group * (-(-f_pad // f_g)))[:f_pad]  # tile up to the mesh size
        y_g = jnp.asarray(y_np_all[:, idx].T, x.dtype)
        w_g = jnp.ones((f_pad, n), x.dtype)
        curve = _cv_deviance_curve_multi(
            jax.random.fold_in(kcvs[group[0]], int(restarts[group[0]])),
            x, y_g, w_g,
            n_folds=n_folds, n_splits=tree_complexity, lr=float(lr_g),
            bag_fraction=bag_fraction, min_leaf=min_leaf, step_size=step_size,
            max_trees=max_trees, tolerance=tol[idx], n_bins=n_bins,
            selectors=selectors[idx], keep_fhist=statistics, mesh=mesh,
            shared_bins=shared_bins, global_bins=global_bins,
        )
        cv_mean = np.asarray(jnp.mean(curve.dev, axis=2))     # (max_cp, f_pad)
        stopped_np = np.asarray(curve.stopped)
        finished = []
        for gi, j in enumerate(group):
            j_stop = max(int(stopped_np[gi]), 1)
            c = cv_mean[:j_stop, gi]
            rose_early = any(jj < j_stop and c[jj] > c[jj - 1] for jj in (1, 2, 3))
            if rose_early and restarts[j] < max_restarts:
                restarts[j] += 1
                lr_used[j] *= 0.5
                continue
            best_cp = int(np.argmin(c))
            done[j] = dict(
                best_cp=best_cp, j_stop=j_stop,
                dev=np.asarray(curve.dev[:j_stop, gi]),
                tdev=(curve.tdev[:j_stop, gi] if statistics else None),
                fbest=(curve.fhist[best_cp, gi] if statistics else None),
            )
            finished.append(j)
        pending = [j for j in pending if j not in finished]

    best_trees = np.asarray(
        [(done[j]["best_cp"] + 1) * step_size for j in range(n_resp)], np.int64
    )
    budget = int(max(step_size, -(-best_trees.max() // step_size) * step_size))
    if global_bins:
        # every response's refit rides the fused Pallas grower under ONE
        # global candidate table (the same deviation as the curve); the
        # stacked flat tree arrays reassemble into the batched BRTState
        # the downstream (raster predict, importance, statistics) expects
        res = _final_fits_global(
            jnp.stack(kfinals), x, ycols.T, best_trees, budget=budget,
            n_splits=tree_complexity, lr_vec=lr_used,
            bag_fraction=bag_fraction, min_leaf=min_leaf, n_bins=n_bins,
            mesh=mesh, with_deviance=True, emit_trees=True,
        )
        edges_np = np.asarray(res["edges"])                  # (p, nb-1)
        tr = lambda key: np.asarray(res[key]).transpose(1, 0, 2)
        feat = tr("feat")                                    # (R, budget, T)
        thr_bin = np.clip(tr("thr_bin"), 0, edges_np.shape[1] - 1)
        trees = Tree(
            feat=jnp.asarray(feat),
            thr=jnp.asarray(
                edges_np[feat, thr_bin], x.dtype
            ),                             # raw-scale thresholds (go left
            #                                iff x <= thr — _edges_lookup)
            internal=jnp.asarray(tr("internal"), x.dtype),
            left=jnp.asarray(tr("left")),
            right=jnp.asarray(tr("right")),
            value=jnp.asarray(tr("value"), x.dtype),
            var_gain=jnp.asarray(
                np.asarray(res["var_gain"]).transpose(1, 0, 2), x.dtype
            ),
        )
        finals = brt.BRTState(
            trees=trees,
            edges=jnp.broadcast_to(
                jnp.asarray(edges_np, x.dtype), (n_resp,) + edges_np.shape
            ),
            f0=res["f0"],
            lr=jnp.asarray(lr_used, x.dtype),
            n_splits=jnp.full((n_resp,), tree_complexity),
            tree_active=jnp.asarray(res["tree_active"], x.dtype),
            train_deviance=jnp.asarray(res["train_deviance"]).T,
            holdout_deviance=jnp.asarray(res["holdout_deviance"]).T,
            train_fit=res["train_fit"],
        )
    else:
        # w == 1 for every response, so the final refits share ONE bin table
        edges = make_bins(x, n_bins)
        xb = bin_data(x, edges)
        fit_one = lambda k, yf, nt, lr: brt.fit(
            k, x, yf, n_trees=budget, n_splits=tree_complexity, lr=lr,
            bag_fraction=bag_fraction, min_leaf=min_leaf, n_bins=n_bins,
            n_trees_active=nt, edges=edges, xb=xb,
        )
        finals = jax.jit(jax.vmap(fit_one))(
            jnp.stack(kfinals), ycols.T, jnp.asarray(best_trees),
            jnp.asarray(lr_used, x.dtype),
        )

    pad = jnp.full((max_cp,), jnp.inf, x.dtype)
    results = []
    for j in range(n_resp):
        d = done[j]
        state_j = jax.tree_util.tree_map(lambda a: a[j], finals)
        dev_j = d["dev"]                                 # (j_stop, K)
        cv_mean_j = jnp.asarray(dev_j.mean(axis=1), x.dtype)
        cv_se_j = jnp.asarray(
            dev_j.std(axis=1, ddof=1) / math.sqrt(n_folds), x.dtype
        )
        kw: dict[str, Any] = {}
        if statistics:
            y_np = y_np_all[:, j]
            n_active = float(n)
            cv_statistics, fitted_vars, fold_fit = _cv_statistics_at_best(
                d["fbest"], y_np, w_np, selectors[j], n_folds, "gaussian"
            )
            fitted, residuals, self_statistics = _self_statistics(
                np.asarray(state_j.train_fit), y_np, w_np, "gaussian",
                total_dev[j], n_active,
            )
            kw = dict(
                training_deviance=pad.at[: d["j_stop"]].set(
                    jnp.asarray(d["tdev"].mean(axis=1), x.dtype)
                ),
                fitted=fitted, residuals=residuals, fitted_vars=fitted_vars,
                fold_fit=fold_fit, self_statistics=self_statistics,
                cv_statistics=cv_statistics,
            )
        results.append(
            GBMStepResult(
                final=state_j,
                best_trees=int(best_trees[j]),
                trees_fitted=d["j_stop"] * step_size,
                cv_deviance=pad.at[: d["j_stop"]].set(cv_mean_j),
                cv_deviance_se=pad.at[: d["j_stop"]].set(cv_se_j),
                family="gaussian",
                learning_rate=float(lr_used[j]),
                restarts=int(restarts[j]),
                selector=selectors[j],
                **kw,
            )
        )
    return results


@highest_precision
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
    family: str = "gaussian",
    prev_stratify: bool = True,
    max_restarts: int = 3,
    offset=None,
    fold_vector=None,
    var_monotone=None,
) -> GBMStepResult:
    """gbm.step-faithful CV-selected BRT fit (see module docstring).

    The three low-traffic reference arguments (mltps itself never passes
    them, V73:247/493, but gbm.step exposes them):

    * ``offset`` — (n,) fixed per-row link-scale term (V73:1664/1774): CV
      fold fits, deviance curves, CV/self statistics, and the final model's
      ``fitted``/``residuals`` all include it; ``predict`` does NOT add it,
      matching ``predict.gbm`` (the reference adds it by hand at its call
      sites, V73:1845-1846/2041).  The intercept-only total deviance stays
      offset-free, as in the reference (V73:1786-1796).
    * ``fold_vector`` — (n,) user-supplied CV fold membership
      (V73:1665/1752-1756); accepts R's 1..n_folds or 0-based labels, and
      raises the reference's wrong-length error.
    * ``var_monotone`` — (p,) in {-1, 0, +1} per predictor (V73:1670/1772):
      every candidate split on a constrained predictor must move the
      working-response mean in the allowed direction (trees._best_splits).
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = x.shape[0]
    w = as_weight(sample_weight, n, x.dtype)
    if offset is not None:
        offset = jnp.asarray(offset, x.dtype)
        if offset.shape != (n,):
            raise ValueError(f"offset must have shape ({n},), got {offset.shape}")
    if var_monotone is not None:
        var_monotone = jnp.asarray(var_monotone, x.dtype)
        if var_monotone.shape != (x.shape[1],):
            raise ValueError(
                f"var_monotone must have shape ({x.shape[1]},), got {var_monotone.shape}"
            )
    n_active = float(np.maximum(np.asarray(jnp.sum(w > 0)), 1))
    # total deviance of the intercept-only model (V73:1786-1796)
    u0 = response(jnp.full((n,), f0_init(y, w, family)), family)
    total_deviance = float(calc_deviance(y, u0, weights=w, family=family, calc_mean=False))
    mean_total_deviance = total_deviance / n_active
    if tolerance is None:
        tolerance = 0.001 * mean_total_deviance  # tolerance.method "auto"

    ksel, kcv, kfinal = jax.random.split(jax.random.fold_in(key, 7), 3)
    if fold_vector is not None:
        fold_vector = np.asarray(fold_vector)
        if fold_vector.shape != (n,):
            # the reference's exact complaint (V73:1752-1753)
            raise ValueError("supplied fold vector is of wrong length")
        selector_np = fold_vector.astype(np.int32)
        if selector_np.min() >= 1 and selector_np.max() == n_folds:
            selector_np = selector_np - 1       # R's 1..n_folds labels
        if selector_np.min() < 0 or selector_np.max() >= n_folds:
            raise ValueError(
                f"fold_vector labels must lie in 1..{n_folds} (R) or 0..{n_folds - 1}"
            )
    else:
        selector_np = _make_selector(
            ksel, y, w, n_folds, family=family, prev_stratify=prev_stratify
        )
    selector = jnp.asarray(selector_np)

    # --- CV curve with the reference's restart rule (V73:1948-1955): if
    # holdout deviance rises within the first 4 added cycles the reference
    # aborts and asks for a smaller learning rate; this driver automates the
    # restart at lr/2
    lr_used = float(learning_rate)
    restarts = 0
    while True:
        curve_fn = jax.jit(
            lambda k: _cv_deviance_curve(
                k, x, y, w, selector,
                n_folds=n_folds, n_splits=tree_complexity, lr=lr_used,
                bag_fraction=bag_fraction, min_leaf=min_leaf, step_size=step_size,
                max_trees=max_trees, tolerance=tolerance, n_bins=n_bins,
                family=family, offset=offset, monotone=var_monotone,
            )
        )
        j, dev, tdev, fhist = curve_fn(jax.random.fold_in(kcv, restarts))
        j = int(j)
        cv_mean_np = np.asarray(jnp.mean(dev[:j], axis=1))
        rose_early = any(
            jj < j and cv_mean_np[jj] > cv_mean_np[jj - 1] for jj in (1, 2, 3)
        )
        if not rose_early or restarts >= max_restarts:
            break
        restarts += 1
        lr_used *= 0.5

    dev = dev[:j]                                   # (j, k)
    cv_mean = jnp.mean(dev, axis=1)
    cv_se = jnp.std(dev, axis=1, ddof=1) / math.sqrt(n_folds)
    t_mean = jnp.mean(tdev[:j], axis=1)
    best_cp = int(jnp.argmin(cv_mean))              # first checkpoint at the min
    best_trees = (best_cp + 1) * step_size
    trees_fitted = j * step_size

    # --- CV statistics at best.trees (V73:2014-2096) from the checkpointed
    # fold fits — per-fold heldout deviance and correlation, fitted-value
    # matrix and its between-fold variances, heldout linear predictors
    fbest = np.asarray(fhist[best_cp])              # (k, n) link scale
    y_np = np.asarray(y)
    w_np = np.asarray(w)
    cv_statistics, fitted_vars, fold_fit = _cv_statistics_at_best(
        fbest, y_np, w_np, selector_np, n_folds, family
    )

    # --- final refit on all rows; budget bucketed to bound recompiles
    budget = max(step_size, -(-best_trees // step_size) * step_size)
    final = brt.fit(
        kfinal, x, y, sample_weight=w,
        n_trees=budget, n_splits=tree_complexity, lr=lr_used,
        bag_fraction=bag_fraction, min_leaf=min_leaf, n_bins=n_bins,
        n_trees_active=best_trees, family=family,
        offset=offset, var_monotone=var_monotone,
    )

    # --- self statistics of the final model (V73:2115-2152, 2190-2192)
    fitted_link = np.asarray(final.train_fit)  # scan carry == predict at x
    fitted, residuals, self_statistics = _self_statistics(
        fitted_link, y_np, w_np, family, total_deviance, n_active
    )

    max_cp = max_trees // step_size
    pad = jnp.full((max_cp,), jnp.inf, x.dtype)
    return GBMStepResult(
        final=final,
        best_trees=best_trees,
        trees_fitted=trees_fitted,
        cv_deviance=pad.at[:j].set(cv_mean),
        cv_deviance_se=pad.at[:j].set(cv_se),
        family=family,
        learning_rate=lr_used,
        restarts=restarts,
        selector=selector_np,
        training_deviance=pad.at[:j].set(t_mean),
        fitted=fitted,
        residuals=residuals,
        fitted_vars=fitted_vars,
        fold_fit=fold_fit,
        self_statistics=self_statistics,
        cv_statistics=cv_statistics,
    )


def predict(result: GBMStepResult, x, type: str = "link", tables=None) -> jax.Array:
    """Boosted score at ``x``; ``type='response'`` applies the inverse link
    (predict.gbm returns the link scale by default; the reference applies
    exp/logistic by hand at its call sites, V73:1837-1851).  For gaussian —
    the only family mltps uses — the two are identical."""
    out = brt.predict(result.final, x, tables=tables)
    if type == "response":
        return response(out, result.family)
    return out


def importance(result: GBMStepResult, names) -> dict:
    return brt.importance(result.final, names)
