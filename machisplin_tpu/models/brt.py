"""Boosted regression trees (gaussian gbm core).

The reference's BRT is ``gbm::gbm`` driven by the vendored ``gbm.step``
(V73:247 CV with tree.complexity=25 / learning.rate=0.01; V73:493 final with
5 / 0.001; bag.fraction 0.5 both).  This module is the gbm core: sequential
gaussian boosting with best-first trees of a fixed split budget
(interaction.depth == n_splits), row subsampling per tree, shrinkage, and an
initial fit F0 = weighted mean.  The gbm.step tree-count selection loop lives
in models/gbm_step.py.

TPU-native: one ``lax.scan`` over trees; each step grows a histogram tree via
one-hot matmuls (models/trees.py).  ``sample_weight`` doubles as the fold
mask so the CV driver vmaps folds through this same code.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import as_weight
from .trees import Tree, bin_data, flat_bin_onehot, grow_bestfirst_tree, make_bins

from ..utils.precision import highest_precision


class BRTState(NamedTuple):
    trees: Tree           # stacked, leading axis = n_trees (budget)
    edges: jax.Array
    f0: jax.Array         # () initial prediction
    lr: jax.Array         # ()
    n_splits: int
    tree_active: jax.Array  # (n_trees,) 1.0 for trees inside best.trees
    train_deviance: jax.Array  # (n_trees,) in-bag gaussian deviance path
    holdout_deviance: jax.Array  # (n_trees,) deviance on sample_weight==0 rows
    train_fit: jax.Array  # (n,) link-scale boosted fit at the TRAINING rows
    #                       (the scan's final carry == predict(state, x) with
    #                       the active-tree mask applied; free, and it spares
    #                       CV-statistics consumers a forest routing pass)


@highest_precision
def fit(
    key,
    x,
    y,
    *,
    sample_weight=None,
    n_trees: int = 1000,
    n_splits: int = 5,
    lr: float = 0.01,
    bag_fraction: float = 0.5,
    min_leaf: float = 10.0,
    n_bins: int = 64,
    n_trees_active=None,
    edges=None,
    xb=None,
    family: str = "gaussian",
    offset=None,
    var_monotone=None,
) -> BRTState:
    """Train a BRT.  ``n_trees`` is the static budget; if ``n_trees_active``
    (traced scalar) is given, later trees still train but contribute nothing
    — the bucketing hook used by gbm_step's final refit.

    ``family``: gaussian / laplace / poisson / bernoulli (gbm's distribution
    argument, V73:1773).  Trees are least-squares fits to the negative
    gradient with family-correct terminal-node re-estimation
    (models/families.py); deviance curves are on the response scale.

    ``offset``: (n,) fixed per-row term on the link scale (gbm's offset,
    V73:1664/1774) — the boosted score carries it throughout training
    (``train_fit`` and the deviance paths include it) but ``predict`` does
    NOT add it, matching ``predict.gbm`` (the reference adds the offset by
    hand at its call sites, V73:1845-1846/2041).

    ``var_monotone``: (p,) in {-1, 0, +1} — gbm's monotone-response
    constraint per predictor (V73:1670/1772); see trees._best_splits.
    """
    from .deviance import calc_deviance
    from .families import f0_init, gradient, leaf_adjust, response

    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n, p = x.shape
    w = as_weight(sample_weight, n, x.dtype)
    if edges is None:
        edges = make_bins(x, n_bins)
    if xb is None:
        xb = bin_data(x, edges)
    # one bf16 one-hot shared by every tree in the chain (trees.flat_bin_onehot)
    b1h = flat_bin_onehot(xb, int(edges.shape[1]) + 1)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    if offset is not None:
        offset = jnp.asarray(offset, x.dtype)
    if var_monotone is not None:
        var_monotone = jnp.asarray(var_monotone, x.dtype)
    f0 = f0_init(y, w, family, offset=offset)
    if n_trees_active is None:
        n_trees_active = jnp.asarray(n_trees)
    active = (jnp.arange(n_trees) < n_trees_active).astype(x.dtype)

    test_w = (w <= 0).astype(x.dtype)
    test_sum = jnp.maximum(jnp.sum(test_w), 1.0)
    n_total = 2 * n_splits + 1

    def step(carry, inp):
        f = carry
        key_t, act = inp
        bag = (jax.random.uniform(key_t, (n,)) < bag_fraction).astype(x.dtype) * w
        z = gradient(y, f, family)
        tree, cur = grow_bestfirst_tree(
            xb, edges, z, bag, n_splits=n_splits, min_leaf=min_leaf,
            return_assign=True, bin1h=b1h, monotone=var_monotone,
        )
        if family != "gaussian":
            tree = tree._replace(
                value=leaf_adjust(tree.value, cur, n_total, y, f, bag, family)
            )
        from .trees import assigned_predict

        # training-row prediction from the grower's own node assignment:
        # no tree_predict gather walk (TPU gathers serialise)
        upd = lr * assigned_predict(tree.value, cur, n_total) * act
        f = f + upd
        u = response(f, family)
        train_dev = calc_deviance(y, u, weights=w, family=family)
        hold_dev = calc_deviance(y, u, weights=test_w, family=family)
        return f, (tree, train_dev, hold_dev)

    keys = jax.random.split(key, n_trees)
    f_init = jnp.full((n,), f0) if offset is None else f0 + offset
    f_fin, (trees, train_dev, hold_dev) = jax.lax.scan(step, f_init, (keys, active))
    return BRTState(
        trees=trees, edges=edges, f0=f0, lr=jnp.asarray(lr, x.dtype),
        n_splits=n_splits, tree_active=active,
        train_deviance=train_dev, holdout_deviance=hold_dev,
        train_fit=f_fin,
    )


def predict(
    state: BRTState, x, n_trees=None, native_threshold: int = 65536, tables=None
) -> jax.Array:
    """F0 + lr * sum of active trees (optionally truncated at ``n_trees``).

    Device batches route to the bin-interval leaf kernel
    (ops/pallas_forest); large concrete CPU batches to the multi-threaded
    C++ forest predictor when built (see models/rf.predict for the
    rationale).  Pass ``tables`` (ops.pallas_forest.build_leaf_bins of
    ``state.trees``) to amortise the host table walk over many blocks.
    """
    x = jnp.asarray(x)
    budget = state.tree_active.shape[0]
    act = state.tree_active
    if n_trees is not None:
        act = act * (jnp.arange(budget) < n_trees)
    weights = act * state.lr
    concrete = not isinstance(x, jax.core.Tracer)
    concrete_trees = not isinstance(state.trees.feat, jax.core.Tracer)
    on_device = jax.default_backend() != "cpu"
    if tables is not None or (
        on_device and concrete and concrete_trees and x.shape[0] >= native_threshold
    ):
        # gbm trees are tiny (J+1 leaves) and final models run to 10^4
        # trees: dense bin-interval leaf algebra beats both serial
        # traversal and host threads by orders of magnitude
        from ..ops.pallas_forest import forest_predict_bins

        return state.f0 + forest_predict_bins(state.trees, x, weights, tables=tables)
    if concrete and x.shape[0] >= native_threshold and not on_device:
        import numpy as np

        from ..io.native import forest_predict_native

        out = forest_predict_native(state.trees, x, state.n_splits, np.asarray(weights))
        if out is not None:
            return jnp.asarray(out, x.dtype) + state.f0
    from .trees import forest_predict

    return state.f0 + forest_predict(state.trees, x, state.n_splits, weights=weights)


def importance(state: BRTState, names) -> dict:
    """gbm relative influence: split-gain totals per variable scaled to sum
    100 (``summary.gbm`` / gbm.step ``$contributions``, V73:495/2115)."""
    gains = jnp.sum(state.trees.var_gain * state.tree_active[:, None], axis=0)
    rel = 100.0 * gains / jnp.maximum(jnp.sum(gains), 1e-12)
    order = jnp.argsort(-rel)
    return {names[int(j)]: float(rel[int(j)]) for j in order}
