"""Random forest regression.

Mirrors the reference's ``randomForest::randomForest(mod.form, data)``
(V73:248 CV; V73:517 final with ``importance=TRUE``): regression defaults
ntree = 500, mtry = max(floor(p/3), 1), nodesize = 5, bootstrap sampling with
replacement; importance report with both %IncMSE (out-of-bag permutation) and
IncNodePurity (summed split-gain), like randomForest's importance matrix
(V73:519).

TPU-native: trees are binned-histogram CARTs grown level-wise with one-hot
matmul statistics (models/trees.py), vmapped in chunks over the tree axis.
Depth is capped (static shapes) at ``max_depth`` — with nodesize 5 this
matches randomForest's effective depth on thousands-of-rows workloads.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import as_weight
from .trees import (
    Tree,
    bin_data,
    flat_bin_cum_onehot,
    forest_predict,
    grow_level_tree,
    make_bins,
    tree_predict,
)

from ..utils.precision import highest_precision


class RFState(NamedTuple):
    trees: Tree           # stacked, leading axis = ntree
    edges: jax.Array      # (p, n_bins - 1)
    max_depth: int
    oob_count: jax.Array  # (ntree, n) bootstrap counts (0 => OOB)
    train_pred: jax.Array  # (n,) all-tree mean prediction at the TRAINING
    #                        rows, from the growers' own node assignments —
    #                        gather-free (run_cv's predict-at-x fast path)


@highest_precision
def fit(
    key,
    x,
    y,
    *,
    sample_weight=None,
    ntree: int = 500,
    mtry: int | None = None,
    max_depth: int = 9,
    min_leaf: float = 5.0,
    n_bins: int = 64,
    tree_chunk: int = 50,
) -> RFState:
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n, p = x.shape
    w = as_weight(sample_weight, n, x.dtype)
    if mtry is None:
        mtry = max(p // 3, 1)
    edges = make_bins(x, n_bins)
    xb = bin_data(x, edges)
    c1h = flat_bin_cum_onehot(xb, n_bins)   # shared by all trees
    n_active = jnp.maximum(jnp.sum(w > 0), 1.0)

    n_total = 2 ** (max_depth + 1) - 1

    def one_tree(key):
        kboot, kgrow = jax.random.split(key)
        # bootstrap: n draws with replacement from the active rows
        logits = jnp.where(w > 0, 0.0, -jnp.inf)
        draws = jax.random.categorical(kboot, logits, shape=(n,))
        counts = (
            (draws[:, None] == jnp.arange(n)[None, :]).astype(x.dtype).sum(axis=0)
        )
        # keep expected sample count equal to the active-row count
        counts = counts * (n_active / n)
        tree, cur = grow_level_tree(
            kgrow, xb, edges, y, counts,
            max_depth=max_depth, min_leaf=min_leaf, mtry=mtry, bin_cum1h=c1h,
            return_assign=True,
        )
        from .trees import assigned_predict

        return tree, counts, assigned_predict(tree.value, cur, n_total)

    keys = jax.random.split(key, ntree)
    chunks = max(ntree // tree_chunk, 1)
    keys = keys.reshape(chunks, -1, 2)
    trees, counts, preds = jax.lax.map(lambda ks: jax.vmap(one_tree)(ks), keys)
    trees = jax.tree.map(lambda a: a.reshape((ntree,) + a.shape[2:]), trees)
    counts = counts.reshape(ntree, n)
    train_pred = preds.reshape(ntree, n).mean(axis=0)
    return RFState(
        trees=trees, edges=edges, max_depth=max_depth, oob_count=counts,
        train_pred=train_pred,
    )


def predict(state: RFState, x, native_threshold: int = 65536, tables=None) -> jax.Array:
    """Forest prediction.

    Device batches route to the bin-interval leaf kernel
    (ops/pallas_forest — dense membership algebra, no gathers); large
    concrete CPU batches to the multi-threaded C++ predictor
    (native/machisplin_native.cpp) — the same division of labor as
    randomForest's own native core.  Traced values (inside jit/vmap) and
    small batches use the blocked gather path.  Pass ``tables``
    (ops.pallas_forest.build_leaf_bins of ``state.trees``) to amortise the
    host table walk over many blocks.
    """
    x = jnp.asarray(x)
    t = state.trees.feat.shape[0]
    concrete = not isinstance(x, jax.core.Tracer)
    concrete_trees = not isinstance(state.trees.feat, jax.core.Tracer)
    on_device = jax.default_backend() != "cpu"
    if tables is not None or (
        on_device and concrete and concrete_trees and x.shape[0] >= native_threshold
    ):
        # precomputed tables force the bin-interval path on ANY backend (the
        # kernel has a jnp twin) so mesh-sharded raster prediction exercises
        # the same code path on the CPU test mesh as on TPU chips
        from ..ops.pallas_forest import forest_predict_bins

        return forest_predict_bins(
            state.trees, x, jnp.full(t, 1.0 / t, jnp.float32), tables=tables
        )
    if concrete and x.shape[0] >= native_threshold and not on_device:
        from ..io.native import forest_predict_native

        out = forest_predict_native(
            state.trees, x, state.max_depth, np.full(t, 1.0 / t, np.float32)
        )
        if out is not None:
            return jnp.asarray(out, x.dtype)
    return forest_predict(state.trees, x, state.max_depth)


@highest_precision
def importance(state: RFState, x, y, names, key=None, sample_weight=None) -> dict:
    """randomForest-style importance matrix: %IncMSE (OOB permutation) and
    IncNodePurity (total split-gain), per covariate (V73:519)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n, p = x.shape
    if key is None:
        key = jax.random.PRNGKey(1313)
    w = as_weight(sample_weight, n, x.dtype)

    purity = jnp.sum(state.trees.var_gain, axis=0)

    def tree_oob_mse(tree, oob_w, xs):
        pred = tree_predict(tree, xs, state.max_depth)
        return jnp.sum(oob_w * (pred - y) ** 2) / jnp.maximum(jnp.sum(oob_w), 1e-12)

    oob_w = (state.oob_count == 0).astype(x.dtype) * w
    base = jax.vmap(lambda t, ow: tree_oob_mse(t, ow, x))(state.trees, oob_w)

    def perm_feature(j, key):
        perm = jax.random.permutation(key, n)
        xp = x.at[:, j].set(x[perm, j])
        mse = jax.vmap(lambda t, ow: tree_oob_mse(t, ow, xp))(state.trees, oob_w)
        return jnp.mean(mse - base)

    keys = jax.random.split(key, p)
    inc_mse = jnp.stack([perm_feature(j, keys[j]) for j in range(p)])
    denom = jnp.maximum(jnp.mean(base), 1e-12)
    out = {}
    for j, nme in enumerate(names):
        out[nme] = {
            "%IncMSE": float(100.0 * inc_mse[j] / denom),
            "IncNodePurity": float(purity[j]),
        }
    return out
