"""Fused Pallas tree-grower kernel (ops/pallas_grow.py).

Three-way equivalence net for the global-bins gbm path:

* the interpreted Pallas kernel against its jnp twin (bit-level — same
  selections, same leaf values, same boosting update);
* the cumulative-one-hot formulation against the round-4 shared grower
  (same split selections on seeded data — the two compute identical gains
  up to bf16 summation order, which only ever flips exact near-ties);
* gbm_step's global_bins CV curve end-to-end against the shared_bins
  curve (same stopping behavior class, close deviances).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from machisplin_tpu.models.trees import (
    assigned_predict_batched,
    bin_data,
    flat_bin_cum_onehot,
    flat_bin_onehot,
    grow_bestfirst_trees_cumshared,
    grow_bestfirst_trees_shared,
    make_bins,
)
from machisplin_tpu.ops.pallas_grow import gbm_tree_update, gbm_tree_update_ref


def _fixture(seed=0, n=211, p=4, nb=16, k=6, signal=True):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(0, 1, (n, p)), jnp.float32)
    edges = make_bins(x, nb)
    xb = bin_data(x, edges)
    if signal:
        y = (
            2.0 * np.asarray(x[:, 0])
            + np.sin(4 * np.asarray(x[:, 1]))
            + 0.1 * rng.standard_normal(n)
        )
    else:
        y = rng.standard_normal(n)
    ys = jnp.asarray(np.tile(y, (k, 1)), jnp.float32)
    ws = jnp.asarray(rng.uniform(size=(k, n)) < 0.7, jnp.float32)
    return x, xb, ys, ws, nb


@pytest.mark.quick
def test_cumshared_matches_shared_selections():
    """Same splits, same assignments, matching leaf values (exact-path
    creation totals vs end-time one-hot sums agree to f32 roundoff)."""
    x, xb, ys, ws, nb = _fixture()
    b1h = flat_bin_onehot(xb, nb)
    c1h = flat_bin_cum_onehot(xb, nb)
    v_old, cur_old = jax.jit(
        lambda: grow_bestfirst_trees_shared(
            xb, ys, ws, n_splits=7, min_leaf=5.0, bin1h=b1h
        )
    )()
    v_new, cur_new = jax.jit(
        lambda: grow_bestfirst_trees_cumshared(
            xb, ys, ws, n_splits=7, min_leaf=5.0, bin_cum1h=c1h
        )
    )()
    np.testing.assert_array_equal(np.asarray(cur_old), np.asarray(cur_new))
    # leaf values agree where assigned; unassigned slots are 0 in both
    p_old = assigned_predict_batched(v_old, cur_old, 15)
    p_new = assigned_predict_batched(v_new, cur_new, 15)
    np.testing.assert_allclose(np.asarray(p_old), np.asarray(p_new), atol=2e-5)


@pytest.mark.quick
def test_pallas_kernel_matches_jnp_twin_interpret():
    x, xb, ys, ws, nb = _fixture(seed=3, k=5)
    c1h = flat_bin_cum_onehot(xb, nb)
    xbt = xb.T.astype(jnp.float32)
    f = jnp.asarray(0.1 * np.ones_like(np.asarray(ys)), jnp.float32)
    y = ys + f
    kw = dict(n_splits=7, nb=nb, min_leaf=5.0, lr=0.3)
    out_ref = gbm_tree_update_ref(xbt, c1h, y, f, ws, **kw)
    out_pl = gbm_tree_update(
        xbt, c1h, y, f, ws, interpret=True, use_pallas=True, **kw
    )
    np.testing.assert_allclose(
        np.asarray(out_ref), np.asarray(out_pl), atol=1e-6, rtol=0
    )


@pytest.mark.quick
def test_pallas_kernel_chain_padding_and_degenerate_chains():
    """Chain counts off the block size pad safely; all-masked chains (no
    valid split, empty bag) predict 0 and leave f untouched."""
    x, xb, ys, ws, nb = _fixture(seed=5, k=3)
    ws = ws.at[2].set(0.0)                      # chain 2: empty bag
    c1h = flat_bin_cum_onehot(xb, nb)
    xbt = xb.T.astype(jnp.float32)
    f = jnp.zeros_like(ys)
    kw = dict(n_splits=4, nb=nb, min_leaf=5.0, lr=1.0)
    out_ref = gbm_tree_update_ref(xbt, c1h, ys, f, ws, **kw)
    out_pl = gbm_tree_update(
        xbt, c1h, ys, f, ws, interpret=True, use_pallas=True, chain_block=2, **kw
    )
    np.testing.assert_allclose(
        np.asarray(out_ref), np.asarray(out_pl), atol=1e-6, rtol=0
    )
    np.testing.assert_array_equal(np.asarray(out_pl[2]), np.zeros(ys.shape[1]))


@pytest.mark.quick
def test_emit_tree_matches_twin_and_routes_consistently():
    """emit_tree outputs: kernel(interpret) == twin bit-level, and the
    emitted flat tree re-predicts the kernel's own boosting update."""
    from machisplin_tpu.models.trees import Tree, _edges_lookup, tree_predict

    x, xb, ys, ws, nb = _fixture(seed=9, k=4)
    edges = make_bins(x, nb)
    c1h = flat_bin_cum_onehot(xb, nb)
    xbt = xb.T.astype(jnp.float32)
    f = jnp.zeros_like(ys)
    kw = dict(n_splits=6, nb=nb, min_leaf=5.0, lr=1.0)
    out_pl = gbm_tree_update(
        xbt, c1h, ys, f, ws, interpret=True, use_pallas=True,
        emit_tree=True, **kw
    )
    out_ref = gbm_tree_update_ref(xbt, c1h, ys, f, ws, emit_tree=True, **kw)
    for a, b in zip(out_pl, out_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=0
        )
    # route the raw data through the emitted tree of chain 0: must equal
    # the boosting delta (lr=1, f=0 => f_new IS value[cur])
    f_new, feat, thr_bin, internal, left, right, value, _vg = out_pl
    tree0 = Tree(
        feat=feat[0], thr=_edges_lookup(edges, feat[0], thr_bin[0]),
        internal=internal[0], left=left[0], right=right[0], value=value[0],
        var_gain=jnp.zeros(x.shape[1]),
    )
    routed = tree_predict(tree0, x, 6)
    np.testing.assert_allclose(
        np.asarray(routed), np.asarray(f_new[0]), atol=1e-6, rtol=0
    )


@pytest.mark.quick
def test_global_bins_curve_close_to_shared_bins():
    """gbm_step fit_outer_batched: global-bins CV predictions stay close to
    the shared-bins run (same folds, same bag stream, near-identical split
    candidates) and carry real signal."""
    from machisplin_tpu.models.gbm_step import fit_outer_batched

    rng = np.random.default_rng(11)
    n, p = 240, 3
    x = rng.uniform(0, 1, (n, p)).astype(np.float32)
    y = (2 * x[:, 0] + np.sin(5 * x[:, 1]) + 0.1 * rng.standard_normal(n)).astype(
        np.float32
    )
    w = np.ones((2, n), np.float32)
    w[0, :24] = 0.0
    w[1, 24:48] = 0.0
    kw = dict(
        tree_complexity=4, learning_rate=0.05, n_folds=5, step_size=10,
        max_trees=200, min_leaf=5.0, n_bins=16,
    )
    key = jax.random.PRNGKey(2)
    pred_g, bt_g = fit_outer_batched(key, x, y, w, global_bins=True, **kw)
    pred_s, bt_s = fit_outer_batched(key, x, y, w, global_bins=False, **kw)
    # both runs should fit the signal well on their training rows
    for pred in (pred_g, pred_s):
        r = np.corrcoef(pred[0][w[0] > 0], y[w[0] > 0])[0, 1]
        assert r**2 > 0.9
    # and agree with each other closely (candidate tables differ only in
    # 90%-vs-100% quantile estimates)
    rms = float(np.sqrt(np.mean((pred_g - pred_s) ** 2)))
    assert rms < 0.15 * float(np.std(y))
