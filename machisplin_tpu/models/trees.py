"""Shared decision-tree infrastructure for RF and BRT on TPU.

The reference leans on two native tree engines — randomForest (Fortran) and
gbm (C++) (V73:248/517, V73:247/493 via the vendored gbm.step driver).  Both
are branchy, pointer-chasing algorithms; the TPU-native reformulation here is
fully dense:

* features are pre-binned into quantile histograms (LightGBM-style), so a
  split search is a prefix-sum over (node, feature, bin) statistics;
* per-node histograms are built as **one-hot matmuls** on the MXU
  (node-membership one-hot (n, nodes) contracted against per-feature bin
  one-hots), not scatters — XLA:TPU scatters serialise, matmuls fly;
* trees are stored as flat arrays (feat, threshold, children, value) and
  grown with static shapes: level-wise to a fixed max depth for RF,
  best-first with a fixed split budget for BRT (gbm's interaction.depth is a
  split budget, J splits -> J+1 leaves);
* prediction routes all points in parallel with a fixed-depth gather loop.

Everything jits and vmaps (over trees for RF, over CV folds for BRT).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Tree",
    "bestfirst_forest_predict_mxu",
    "build_path_matrices",
    "make_bins",
    "make_bins_masked",
    "bin_data",
    "flat_bin_onehot",
    "flat_bin_cum_onehot",
    "grow_bestfirst_trees_cumshared",
    "grow_level_tree",
    "grow_bestfirst_tree",
    "tree_assign",
    "tree_predict",
    "forest_predict",
]


class Tree(NamedTuple):
    feat: jax.Array         # (N,) int32 split feature (0 where leaf)
    thr: jax.Array          # (N,) raw-scale threshold; go left iff x <= thr
    internal: jax.Array     # (N,) 1.0 if split node
    left: jax.Array         # (N,) int32 child ids
    right: jax.Array        # (N,) int32
    value: jax.Array        # (N,) leaf prediction
    var_gain: jax.Array     # (p,) summed split gain per feature (importance)


def make_bins(x, n_bins: int = 64):
    """Per-feature quantile bin edges, (p, n_bins - 1)."""
    qs = jnp.linspace(0.0, 1.0, n_bins + 1)[1:-1]
    return jnp.quantile(jnp.asarray(x), qs, axis=0).T


def make_bins_masked(x, w, n_bins: int = 64):
    """Quantile bin edges over the rows with ``w`` > 0, (p, n_bins - 1).

    The per-inner-fold analog of ``make_bins``: each CV fold's gbm sees only
    its training subset (the reference's per-fold ``gbm::gbm`` calls,
    V73:1830/1908), so its split candidates come from that subset's
    quantiles.  Linear interpolation between order statistics of the active
    rows, vmappable over a leading fold axis of ``w``.
    """
    x = jnp.asarray(x)
    n, p = x.shape
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    xs = jnp.sort(jnp.where(w[:, None] > 0, x, big), axis=0)      # active first
    na = jnp.sum((w > 0).astype(jnp.int32))
    qs = jnp.linspace(0.0, 1.0, n_bins + 1)[1:-1].astype(x.dtype)
    pos = qs * jnp.maximum(na - 1, 0).astype(x.dtype)             # (nb-1,)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, jnp.maximum(na - 1, 0))
    frac = (pos - lo.astype(x.dtype))[None, :]
    vlo = jnp.take_along_axis(xs.T, jnp.broadcast_to(lo[None, :], (p, lo.shape[0])), axis=1)
    vhi = jnp.take_along_axis(xs.T, jnp.broadcast_to(hi[None, :], (p, hi.shape[0])), axis=1)
    return vlo * (1 - frac) + vhi * frac


def bin_data(x, edges):
    """Bin index per (sample, feature): number of edges strictly below x."""
    x = jnp.asarray(x)
    return jnp.sum(x[:, :, None] > edges[None, :, :], axis=2).astype(jnp.int32)


def flat_bin_onehot(xb, nb: int):
    """(n, p * nb) bf16 one-hot of the binned features.

    0/1 values are EXACT in bf16, so storing the one-hot at half the bytes
    halves the histogram matmuls' HBM traffic — the split loop's floor —
    with no rounding anywhere.  Build this ONCE per (fold, chain) outside
    the tree/split loops; rebuilding it per tree was pure waste."""
    n, p = xb.shape
    oh = xb[:, :, None] == jnp.arange(nb, dtype=xb.dtype)[None, None, :]
    return oh.astype(jnp.bfloat16).reshape(n, p * nb)


def flat_bin_cum_onehot(xb, nb: int):
    """(n, p * nb) bf16 CUMULATIVE one-hot: 1 iff ``xb[i, f] <= b``.

    Contracting weights against THIS table yields left-cumulative split
    statistics directly — ``(w @ cum1h)[f*nb + b] = sum of w over rows with
    bin_f <= b`` — which removes the per-node histogram cumsum from the
    split search entirely (the round-5 SPLIT_STEP_ABLATION pinned 91% of
    the split-step wall on that cumsum+gain+argmax chain).  0/1 values are
    exact in bf16, like ``flat_bin_onehot``."""
    n, p = xb.shape
    oh = xb[:, :, None] <= jnp.arange(nb, dtype=xb.dtype)[None, None, :]
    return oh.astype(jnp.bfloat16).reshape(n, p * nb)


def _hist_matmul(a, bin1h_flat):
    """Histogram contraction a (r, n) @ one-hot (n, p*nb) at ~f32 accuracy.

    The B-side one-hot is exact in bf16; the A-side (weights / weighted
    responses) splits into bf16 hi+lo halves, so TWO bf16 MXU passes bound
    the error at ~1e-5 relative — against HIGHEST's six passes on an f32
    one-hot with double the HBM bytes.  These sums feed split GAINS only
    (leaf values take the HIGHEST-precision path), so the last digits can
    at most flip ties between near-equal split candidates — NOT the
    statistics the round-1 bf16 bug corrupted (see CLAUDE.md)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(a.dtype)).astype(jnp.bfloat16)
    dn = (((a.ndim - 1,), (a.ndim - 2,)), ((), ()))
    hi = jax.lax.dot_general(a_hi, bin1h_flat, dn, preferred_element_type=jnp.float32)
    lo = jax.lax.dot_general(a_lo, bin1h_flat, dn, preferred_element_type=jnp.float32)
    return (hi + lo).astype(a.dtype)


def _node_histograms(cur, n_nodes, bin1h_flat, nb, w, wy):
    """Histograms via MXU: returns (n_nodes, p, nb) sums of w and w*y.

    cur:        (n,) node id per sample (ids outside [0, n_nodes) => ignored)
    bin1h_flat: (n, p * nb) bf16 one-hot (``flat_bin_onehot``)

    The w and w*y statistics ride ONE stacked matmul (2N output rows): the
    split loop is launch-latency-bound on this runtime, so halving the
    kernel count matters more than the flops.
    """
    node1h = (cur[:, None] == jnp.arange(n_nodes)[None, :]).astype(w.dtype)  # (n, N)
    p = bin1h_flat.shape[1] // nb
    a = jnp.concatenate([node1h * w[:, None], node1h * wy[:, None]], axis=1)
    h = _hist_matmul(a.T, bin1h_flat)            # (2N, p*nb)
    return h[:n_nodes].reshape(n_nodes, p, nb), h[n_nodes:].reshape(n_nodes, p, nb)


def _best_splits(hw, hwy, min_leaf, feat_mask=None, monotone=None):
    """Best (feature, bin) per node from cumulative histogram stats.

    Returns (gain, feat, bin) each (n_nodes,).  Gain is the SSE decrease
    sum_L(wy)^2/sum_L(w) + sum_R(wy)^2/sum_R(w) - tot(wy)^2/tot(w).

    ``monotone`` (p,) in {-1, 0, +1}: gbm's var.monotone constraint
    (V73:1670/1772) — a candidate split on feature f with monotone[f]=+1
    is admissible only if the right child's mean working response is >=
    the left child's (and the reverse for -1); violating candidates score
    -inf, exactly gbm's C++ grower's check at split-evaluation time.
    """
    eps = 1e-12
    # one stacked cumsum (launch-latency-bound loop; see _node_histograms)
    c2 = jnp.cumsum(jnp.stack([hw, hwy]), axis=3)
    cw, cwy = c2[0], c2[1]
    tw = cw[:, :, -1:]
    twy = cwy[:, :, -1:]
    lw, lwy = cw[:, :, :-1], cwy[:, :, :-1]      # split "bin <= b", b < nb-1
    rw, rwy = tw - lw, twy - lwy
    gain = (
        lwy * lwy / jnp.maximum(lw, eps)
        + rwy * rwy / jnp.maximum(rw, eps)
        - twy * twy / jnp.maximum(tw, eps)
    )
    ok = (lw >= min_leaf) & (rw >= min_leaf)
    gain = jnp.where(ok, gain, -jnp.inf)
    if feat_mask is not None:
        gain = jnp.where(feat_mask[:, :, None] > 0, gain, -jnp.inf)
    if monotone is not None:
        lmean = lwy / jnp.maximum(lw, eps)
        rmean = rwy / jnp.maximum(rw, eps)
        viol = monotone[None, :, None] * (rmean - lmean) < 0
        gain = jnp.where(viol, -jnp.inf, gain)
    n_nodes, p, nbm1 = gain.shape
    flat = gain.reshape(n_nodes, p * nbm1)
    best = jnp.argmax(flat, axis=1)
    # max == flat[best]; jnp.max avoids a take_along_axis gather (TPU
    # gathers serialise — they dominated the split-step latency)
    best_gain = jnp.max(flat, axis=1)
    return best_gain, (best // nbm1).astype(jnp.int32), (best % nbm1).astype(jnp.int32)


def _best_splits_cum(clw, clwy, tw, twy, min_leaf, feat_mask=None):
    """Best (feature, bin) per node from CUMULATIVE histogram stats.

    clw/clwy: (R, p, nb) left-cumulative sums (``flat_bin_cum_onehot``
    contractions) — ``clw[r, f, b]`` = sum of w over rows with bin_f <= b;
    tw/twy: (R, 1, 1) node totals (exact row-sums, no histogram round-off —
    or the cumulative table's own last-bin column, which IS the total).
    Same gain formula / tie order / return convention as ``_best_splits``
    but with NO cumsum — the left stats arrive cumulative and the right
    side is ``total - left``.  Candidate b = nb-1 (nothing on the right)
    is masked instead of sliced so the flat argmax stays one op."""
    eps = 1e-12
    lw, lwy = clw, clwy
    rw, rwy = tw - clw, twy - clwy
    gain = (
        lwy * lwy / jnp.maximum(lw, eps)
        + rwy * rwy / jnp.maximum(rw, eps)
        - twy * twy / jnp.maximum(tw, eps)
    )
    n_nodes, p, nb = gain.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (n_nodes, p, nb), 2)
    ok = (lw >= min_leaf) & (rw >= min_leaf) & (pos < nb - 1)
    if feat_mask is not None:
        ok = ok & (feat_mask[:, :, None] > 0)
    gain = jnp.where(ok, gain, -jnp.inf)
    flat = gain.reshape(n_nodes, p * nb)
    best = jnp.argmax(flat, axis=1)
    best_gain = jnp.max(flat, axis=1)
    return best_gain, (best // nb).astype(jnp.int32), (best % nb).astype(jnp.int32)


def _edges_lookup(edges, feat, thr_bin):
    """edges[feat, thr_bin] without a gather (TPU gathers serialise): the
    one-hot contraction copies values exactly at HIGHEST precision."""
    p, nbm1 = edges.shape
    fsel = (feat[:, None] == jnp.arange(p)[None, :]).astype(edges.dtype)
    bsel = (
        jnp.clip(thr_bin, 0, nbm1 - 1)[:, None] == jnp.arange(nbm1)[None, :]
    ).astype(edges.dtype)
    per_feat = jnp.matmul(bsel, edges.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(per_feat * fsel, axis=1)


def _leaf_values(cur, n_total, w, wy):
    node1h = (cur[:, None] == jnp.arange(n_total)[None, :]).astype(w.dtype)
    sw = node1h.T @ w
    swy = node1h.T @ wy
    return swy / jnp.maximum(sw, 1e-12)


def grow_level_tree(
    key, xb, edges, y, w, *, max_depth: int = 8, min_leaf: float = 5.0,
    mtry: int | None = None, bin_cum1h=None, return_assign: bool = False,
):
    """CART regression tree grown level-wise to ``max_depth`` (heap layout).

    randomForest semantics: per-node random ``mtry``-feature subset, split by
    SSE decrease, stop at ``min_leaf`` (nodesize).  ``w`` carries bootstrap
    counts (0 for out-of-bag / masked rows).  Pass ``bin_cum1h``
    (``flat_bin_cum_onehot(xb, nb)``) to share one table across many trees.

    Split statistics arrive CUMULATIVE off the MXU (``_best_splits_cum``) —
    round 5 removed the per-level stacked cumsum over the (trees, nodes, p,
    nb) histograms, which at depth 8 ran over 16M-element tensors per
    50-tree chunk.  Node totals are the cumulative table's own last-bin
    column.  Leaf VALUES stay on the exact one-hot path (``_leaf_values``).
    """
    n, p = xb.shape
    nb = int(edges.shape[1]) + 1
    n_total = 2 ** (max_depth + 1) - 1
    dtype = y.dtype
    if bin_cum1h is None:
        bin_cum1h = flat_bin_cum_onehot(xb, nb)
    wy = w * y

    feat = jnp.zeros((n_total,), jnp.int32)
    thr_bin = jnp.zeros((n_total,), jnp.int32)
    internal = jnp.zeros((n_total,), dtype)
    var_gain = jnp.zeros((p,), dtype)
    cur = jnp.zeros((n,), jnp.int32)

    for level in range(max_depth):
        offset = 2**level - 1
        n_nodes = 2**level
        local = cur - offset                       # valid iff in [0, n_nodes)
        chw, chwy = _node_histograms(local, n_nodes, bin_cum1h, nb, w, wy)
        if mtry is not None and mtry < p:
            key, sub = jax.random.split(key)
            scores = jax.random.uniform(sub, (n_nodes, p))
            kth = jnp.sort(scores, axis=1)[:, p - mtry]
            feat_mask = (scores >= kth[:, None]).astype(dtype)
        else:
            feat_mask = None
        gain, bfeat, bbin = _best_splits_cum(
            chw, chwy, chw[:, :1, -1:], chwy[:, :1, -1:], min_leaf, feat_mask
        )
        do_split = gain > 1e-9
        idx = offset + jnp.arange(n_nodes)
        feat = feat.at[idx].set(jnp.where(do_split, bfeat, 0))
        thr_bin = thr_bin.at[idx].set(jnp.where(do_split, bbin, 0))
        internal = internal.at[idx].set(do_split.astype(dtype))
        var_gain = var_gain + jnp.sum(
            jnp.where(do_split, gain, 0.0)[:, None]
            * (bfeat[:, None] == jnp.arange(p)[None, :]),
            axis=0,
        )
        # route samples sitting in split nodes down to their children —
        # dense one-hot contractions against THIS level's split decisions
        # (per-sample gathers serialise on TPU; see grow_bestfirst_tree)
        in_level = (local >= 0) & (local < n_nodes)
        node1h = (
            (local[:, None] == jnp.arange(n_nodes)[None, :]) & in_level[:, None]
        ).astype(dtype)                                            # (n, n_nodes)
        fsel1h = (bfeat[:, None] == jnp.arange(p)[None, :]).astype(dtype)  # (n_nodes, p)
        feat_sel = jnp.matmul(
            node1h, fsel1h, precision=jax.lax.Precision.HIGHEST
        )                                                          # (n, p) 0/1
        sample_bin = jnp.sum(xb * feat_sel, axis=1)
        node_bin = jnp.matmul(
            node1h, bbin.astype(dtype), precision=jax.lax.Precision.HIGHEST
        )
        node_split = (
            jnp.matmul(
                node1h, do_split.astype(dtype), precision=jax.lax.Precision.HIGHEST
            )
            > 0
        )
        child = 2 * cur + 1 + (sample_bin > node_bin)
        cur = jnp.where(in_level & node_split, child, cur)

    value = _leaf_values(cur, n_total, w, wy)
    heap = jnp.arange(n_total, dtype=jnp.int32)
    thr = _edges_lookup(edges, feat, thr_bin)
    tree = Tree(
        feat=feat, thr=thr, internal=internal,
        left=2 * heap + 1, right=2 * heap + 2, value=value, var_gain=var_gain,
    )
    # every row's terminal node, tracked for free during growth — RF's CV
    # predictions ride this + assigned_predict instead of the serialising
    # per-tree gather walk (the round-5 letter-r attribution)
    return (tree, cur) if return_assign else tree


def grow_bestfirst_tree(
    xb, edges, y, w, *, n_splits: int, min_leaf: float = 10.0,
    return_assign: bool = False, bin1h=None, monotone=None,
):
    """gbm-style tree: exactly ``n_splits`` best-first splits (J+1 leaves).

    Each step splits the current leaf with the largest SSE gain — gbm's
    interaction.depth semantics (the driver's tree.complexity, V73:247/493).

    The split loop is INCREMENTAL (the LightGBM recurrence, re-derived for
    dense TPU algebra): a leaf's histogram — and therefore its best split —
    never changes until the leaf itself splits, so each step only (1) takes
    an argmax over the CACHED per-leaf best gains, (2) computes the left
    child's and the parent's histograms in one 4-row masked matmul against
    the shared bf16 one-hot, (3) derives the right child by subtraction,
    and (4) scores just those two children.  The old implementation
    re-histogrammed every one of the 2J+1 node slots each step — a
    (2(2J+1), n) x (n, p*nb) matmul 25x this one — which made the split
    step the pipeline's dominant cost (~1.3 ms x 65k steps on the bundled
    workload).  The loop is a static Python unroll so the two child slots
    of step k are compile-time rows (2k+1, 2k+2): cache updates are static
    dynamic-update-slices, never traced-index scatters (TPU scatters
    serialise, see CLAUDE.md).

    ``return_assign=True`` additionally returns every TRAINING row's node
    id (tracked for free during growth): boosting drivers predict on the
    training rows with one dense one-hot matvec instead of re-routing
    through ``tree_predict``'s gather walk.  Pass ``bin1h``
    (``flat_bin_onehot(xb, nb)``) to share the one-hot across the trees of
    a boosting chain instead of rebuilding it per tree.  ``monotone``
    ((p,) in {-1, 0, +1}) applies gbm's var.monotone admissibility check to
    every candidate split (see ``_best_splits``).
    """
    n, p = xb.shape
    nb = int(edges.shape[1]) + 1
    n_total = 2 * n_splits + 1
    dtype = y.dtype
    if bin1h is None:
        bin1h = flat_bin_onehot(xb, nb)
    wy = w * y
    neg = jnp.asarray(-jnp.inf, dtype)

    iota_nodes = jnp.arange(n_total)
    p_iota = jnp.arange(p)

    # root statistics + candidate (the only live leaf before step 0)
    root = _hist_matmul(jnp.stack([w, wy]), bin1h).reshape(2, p, nb)
    g0, f0, b0 = _best_splits(
        root[0][None], root[1][None], min_leaf, monotone=monotone
    )
    node_gain = jnp.full((n_total,), neg, dtype).at[0].set(g0[0])
    node_feat = jnp.zeros((n_total,), jnp.int32).at[0].set(f0[0])
    node_bin = jnp.zeros((n_total,), jnp.int32).at[0].set(b0[0])

    feat = jnp.zeros((n_total,), jnp.int32)
    thr_bin = jnp.zeros((n_total,), jnp.int32)
    internal = jnp.zeros((n_total,), dtype)
    left = jnp.zeros((n_total,), jnp.int32)
    right = jnp.zeros((n_total,), jnp.int32)
    cur = jnp.zeros((n,), jnp.int32)
    var_gain = jnp.zeros((p,), dtype)

    for k in range(n_splits):
        q = jnp.argmax(node_gain)               # which leaf splits (traced)
        gq = jnp.max(node_gain)                 # == node_gain[q], gather-free
        ok = gq > 1e-9
        qsel = iota_nodes == q
        bfq = jnp.sum(jnp.where(qsel, node_feat, 0), dtype=jnp.int32)
        bbq = jnp.sum(jnp.where(qsel, node_bin, 0), dtype=jnp.int32)
        lid, rid = 2 * k + 1, 2 * k + 2         # static child slots
        upd = qsel & ok
        feat = jnp.where(upd, bfq, feat)
        thr_bin = jnp.where(upd, bbq, thr_bin)
        internal = jnp.where(upd, 1.0, internal)
        left = jnp.where(upd, lid, left)
        right = jnp.where(upd, rid, right)
        var_gain = var_gain + jnp.where(ok, gq, 0.0) * (bfq == p_iota).astype(dtype)
        sample_bin = jnp.sum(
            jnp.where(p_iota[None, :] == bfq, xb, 0), axis=1, dtype=jnp.int32
        )
        in_parent = ok & (cur == q)
        go_left = in_parent & (sample_bin <= bbq)
        lm = go_left.astype(dtype)
        pm = in_parent.astype(dtype)
        # left + parent histograms in ONE 4-row matmul; right by subtraction
        h4 = _hist_matmul(
            jnp.stack([w * lm, wy * lm, w * pm, wy * pm]), bin1h
        ).reshape(4, p, nb)
        cw = jnp.stack([h4[0], h4[2] - h4[0]])  # (2, p, nb) child w sums
        cwy = jnp.stack([h4[1], h4[3] - h4[1]])
        cg, cf, cb = _best_splits(cw, cwy, min_leaf, monotone=monotone)
        node_gain = jnp.where(qsel, neg, node_gain)  # parent is now internal
        node_gain = node_gain.at[lid].set(jnp.where(ok, cg[0], neg))
        node_gain = node_gain.at[rid].set(jnp.where(ok, cg[1], neg))
        node_feat = node_feat.at[lid].set(cf[0]).at[rid].set(cf[1])
        node_bin = node_bin.at[lid].set(cb[0]).at[rid].set(cb[1])
        cur = jnp.where(in_parent, jnp.where(sample_bin <= bbq, lid, rid), cur)

    value = _leaf_values(cur, n_total, w, wy)
    thr = _edges_lookup(edges, feat, thr_bin)
    tree = Tree(
        feat=feat, thr=thr, internal=internal, left=left, right=right,
        value=value, var_gain=var_gain,
    )
    return (tree, cur) if return_assign else tree


def assigned_predict(value, cur, n_total):
    """Leaf-value lookup value[cur] as a dense one-hot matvec (no gather)."""
    node1h = (cur[:, None] == jnp.arange(n_total)[None, :]).astype(value.dtype)
    return jnp.matmul(node1h, value, precision=jax.lax.Precision.HIGHEST)


def grow_bestfirst_trees_shared(
    xb, ys, ws, *, n_splits: int, min_leaf: float, bin1h,
):
    """K best-first trees grown in lockstep on ONE shared binned dataset.

    The bandwidth-shaped variant of ``grow_bestfirst_tree`` for gbm.step's
    inner-fold chains: all K chains of one outer fold share ``xb``/``bin1h``
    (split candidates from the OUTER training subset's quantiles instead of
    each inner fold's own 90% — the shared_bins deviation, documented in
    gbm_step), so each split step's histogram contraction reads the one-hot
    ONCE for a (4K, n) A-side instead of K times for (4, n) sides.  The
    split step is HBM-bound on exactly those one-hot reads (round-5
    CV_LETTERS attribution), so this is ~K x less traffic per step.

    xb (n, p) shared binned data; ys (K, n) per-chain regression targets
    (boosting gradients); ws (K, n) per-chain bag weights (0 = out-of-bag /
    masked).  Returns (value (K, n_total), cur (K, n)) — the boosting driver
    only needs leaf values and training-row assignments (``feat``/``thr``
    bookkeeping is dead weight on the CV curve, which discards the trees).
    Selection semantics per chain are identical to ``grow_bestfirst_tree``.
    """
    n, p = xb.shape
    k_chains = ws.shape[0]
    dtype = ys.dtype
    n_total = 2 * n_splits + 1
    neg = jnp.asarray(-jnp.inf, dtype)
    iota_nodes = jnp.arange(n_total)
    p_iota = jnp.arange(p)
    wys = ws * ys

    # root statistics for every chain: ONE contraction against the shared
    # one-hot, rows [w_0..w_{K-1}, wy_0..wy_{K-1}]
    nb = bin1h.shape[1] // p
    root = _hist_matmul(jnp.concatenate([ws, wys], axis=0), bin1h)  # (2K, p*nb)
    g0, f0, b0 = _best_splits(
        root[:k_chains].reshape(k_chains, p, nb),
        root[k_chains:].reshape(k_chains, p, nb),
        min_leaf,
    )
    node_gain = jnp.full((k_chains, n_total), neg, dtype).at[:, 0].set(g0)
    node_feat = jnp.zeros((k_chains, n_total), jnp.int32).at[:, 0].set(f0)
    node_bin = jnp.zeros((k_chains, n_total), jnp.int32).at[:, 0].set(b0)
    cur = jnp.zeros((k_chains, n), jnp.int32)
    xb_f = xb.astype(dtype)

    for k in range(n_splits):
        q = jnp.argmax(node_gain, axis=1)                   # (K,)
        gq = jnp.max(node_gain, axis=1)
        ok = gq > 1e-9
        qsel = iota_nodes[None, :] == q[:, None]            # (K, n_total)
        bfq = jnp.sum(jnp.where(qsel, node_feat, 0), axis=1, dtype=jnp.int32)
        bbq = jnp.sum(jnp.where(qsel, node_bin, 0), axis=1, dtype=jnp.int32)
        lid, rid = 2 * k + 1, 2 * k + 2                     # static child slots
        # per-chain split-feature column of the SHARED data: one-hot matmul
        fsel = (bfq[:, None] == p_iota[None, :]).astype(dtype)      # (K, p)
        sample_bin = jnp.matmul(
            fsel, xb_f.T, precision=jax.lax.Precision.HIGHEST
        )                                                            # (K, n)
        in_parent = ok[:, None] & (cur == q[:, None])
        go_left = in_parent & (sample_bin <= bbq[:, None].astype(dtype))
        lm = go_left.astype(dtype)
        pm = in_parent.astype(dtype)
        # left + parent histograms for ALL chains in ONE contraction against
        # the shared one-hot; right children by subtraction
        h = _hist_matmul(
            jnp.concatenate([ws * lm, wys * lm, ws * pm, wys * pm], axis=0),
            bin1h,
        )                                                    # (4K, p*nb)
        hl_w, hl_wy = h[:k_chains], h[k_chains : 2 * k_chains]
        hp_w, hp_wy = h[2 * k_chains : 3 * k_chains], h[3 * k_chains :]
        cw = jnp.concatenate([hl_w, hp_w - hl_w], axis=0).reshape(
            2 * k_chains, p, nb
        )
        cwy = jnp.concatenate([hl_wy, hp_wy - hl_wy], axis=0).reshape(
            2 * k_chains, p, nb
        )
        cg, cf, cb = _best_splits(cw, cwy, min_leaf)
        node_gain = jnp.where(qsel, neg, node_gain)          # parent now internal
        node_gain = node_gain.at[:, lid].set(jnp.where(ok, cg[:k_chains], neg))
        node_gain = node_gain.at[:, rid].set(jnp.where(ok, cg[k_chains:], neg))
        node_feat = node_feat.at[:, lid].set(cf[:k_chains]).at[:, rid].set(cf[k_chains:])
        node_bin = node_bin.at[:, lid].set(cb[:k_chains]).at[:, rid].set(cb[k_chains:])
        cur = jnp.where(
            in_parent,
            jnp.where(go_left, lid, rid),
            cur,
        )

    node1h = (cur[:, :, None] == iota_nodes[None, None, :]).astype(dtype)  # (K, n, T)
    sw = jnp.einsum("knt,kn->kt", node1h, ws,
                    precision=jax.lax.Precision.HIGHEST)
    swy = jnp.einsum("knt,kn->kt", node1h, wys,
                     precision=jax.lax.Precision.HIGHEST)
    value = swy / jnp.maximum(sw, 1e-12)
    return value, cur


def grow_bestfirst_trees_cumshared(
    xb, ys, ws, *, n_splits: int, min_leaf: float, bin_cum1h,
    return_tree: bool = False,
):
    """K best-first trees in lockstep via CUMULATIVE one-hot contractions.

    The op-count-lean reformulation of ``grow_bestfirst_trees_shared`` (the
    round-5 SPLIT_STEP_ABLATION attributed 91% of that step's 136 us to the
    cumsum+gain+argmax chain, on tensors far too small to hide this
    runtime's ~5 us per-op dispatch floor):

    * split stats come CUMULATIVE straight off the MXU — one contraction
      against ``flat_bin_cum_onehot`` replaces histogram + stacked cumsum;
    * node totals are plain row-sums — EXACT f32, so the leaf values this
      produces are creation-time child totals (swy/sw), bit-comparable to
      the exact-path ``_leaf_values`` up to f32 summation order (a leaf's
      member rows never change after its creation);
    * min_leaf gating and split GAINS ride the same bf16 hi+lo contraction
      accuracy class as ``grow_bestfirst_trees_shared`` (~1e-5 relative:
      near-tie selections can flip between the two formulations, nothing
      else — the sanctioned gbm histogram exception, see CLAUDE.md).

    Also the jnp reference twin of the fused Pallas kernel
    (ops/pallas_grow.py), which unrolls exactly this recurrence in one
    kernel launch.  Selection semantics per chain are otherwise identical
    to ``grow_bestfirst_tree`` (gbm's interaction.depth best-first budget,
    V73:247/493).
    """
    n, p = xb.shape
    k_chains = ws.shape[0]
    dtype = ys.dtype
    n_total = 2 * n_splits + 1
    nb = bin_cum1h.shape[1] // p
    neg = jnp.asarray(-jnp.inf, dtype)
    iota_nodes = jnp.arange(n_total)
    p_iota = jnp.arange(p)
    wys = ws * ys

    croot = _hist_matmul(jnp.concatenate([ws, wys], axis=0), bin_cum1h)
    tw = jnp.sum(ws, axis=1)                                  # (K,) exact
    twy = jnp.sum(wys, axis=1)
    g0, f0, b0 = _best_splits_cum(
        croot[:k_chains].reshape(k_chains, p, nb),
        croot[k_chains:].reshape(k_chains, p, nb),
        tw[:, None, None], twy[:, None, None], min_leaf,
    )
    node_gain = jnp.full((k_chains, n_total), neg, dtype).at[:, 0].set(g0)
    node_feat = jnp.zeros((k_chains, n_total), jnp.int32).at[:, 0].set(f0)
    node_bin = jnp.zeros((k_chains, n_total), jnp.int32).at[:, 0].set(b0)
    node_sw = jnp.zeros((k_chains, n_total), dtype).at[:, 0].set(tw)
    node_swy = jnp.zeros((k_chains, n_total), dtype).at[:, 0].set(twy)
    cur = jnp.zeros((k_chains, n), jnp.int32)
    xb_f = xb.astype(dtype)
    if return_tree:
        t_feat = jnp.zeros((k_chains, n_total), jnp.int32)
        t_thr = jnp.zeros((k_chains, n_total), jnp.int32)
        t_int = jnp.zeros((k_chains, n_total), dtype)
        t_left = jnp.zeros((k_chains, n_total), jnp.int32)
        t_right = jnp.zeros((k_chains, n_total), jnp.int32)
        t_vg = jnp.zeros((k_chains, p), dtype)

    for k in range(n_splits):
        q = jnp.argmax(node_gain, axis=1)                    # (K,)
        gq = jnp.max(node_gain, axis=1)
        ok = gq > 1e-9
        qsel = iota_nodes[None, :] == q[:, None]             # (K, n_total)
        bfq = jnp.sum(jnp.where(qsel, node_feat, 0), axis=1, dtype=jnp.int32)
        bbq = jnp.sum(jnp.where(qsel, node_bin, 0), axis=1, dtype=jnp.int32)
        lid, rid = 2 * k + 1, 2 * k + 2                      # static child slots
        fsel = (bfq[:, None] == p_iota[None, :]).astype(dtype)       # (K, p)
        sample_bin = jnp.matmul(
            fsel, xb_f.T, precision=jax.lax.Precision.HIGHEST
        )                                                             # (K, n)
        in_parent = ok[:, None] & (cur == q[:, None])
        go_left = in_parent & (sample_bin <= bbq[:, None].astype(dtype))
        lm = go_left.astype(dtype)
        pm = in_parent.astype(dtype)
        # left + parent CUMULATIVE stats for all chains in one contraction;
        # right children by subtraction; totals by exact row-sums
        h = _hist_matmul(
            jnp.concatenate([ws * lm, wys * lm, ws * pm, wys * pm], axis=0),
            bin_cum1h,
        )                                                     # (4K, p*nb)
        clw, clwy = h[:k_chains], h[k_chains : 2 * k_chains]
        cpw, cpwy = h[2 * k_chains : 3 * k_chains], h[3 * k_chains :]
        tl_w = jnp.sum(ws * lm, axis=1)
        tp_w = jnp.sum(ws * pm, axis=1)
        tl_wy = jnp.sum(wys * lm, axis=1)
        tp_wy = jnp.sum(wys * pm, axis=1)
        cw = jnp.concatenate([clw, cpw - clw], axis=0).reshape(2 * k_chains, p, nb)
        cwy = jnp.concatenate([clwy, cpwy - clwy], axis=0).reshape(2 * k_chains, p, nb)
        tws = jnp.concatenate([tl_w, tp_w - tl_w])
        twys = jnp.concatenate([tl_wy, tp_wy - tl_wy])
        cg, cf, cb = _best_splits_cum(
            cw, cwy, tws[:, None, None], twys[:, None, None], min_leaf
        )
        node_gain = jnp.where(qsel, neg, node_gain)
        node_gain = node_gain.at[:, lid].set(jnp.where(ok, cg[:k_chains], neg))
        node_gain = node_gain.at[:, rid].set(jnp.where(ok, cg[k_chains:], neg))
        node_feat = node_feat.at[:, lid].set(cf[:k_chains]).at[:, rid].set(cf[k_chains:])
        node_bin = node_bin.at[:, lid].set(cb[:k_chains]).at[:, rid].set(cb[k_chains:])
        zero = jnp.zeros_like(tl_w)
        node_sw = node_sw.at[:, lid].set(jnp.where(ok, tl_w, zero))
        node_sw = node_sw.at[:, rid].set(jnp.where(ok, tp_w - tl_w, zero))
        node_swy = node_swy.at[:, lid].set(jnp.where(ok, tl_wy, zero))
        node_swy = node_swy.at[:, rid].set(jnp.where(ok, tp_wy - tl_wy, zero))
        cur = jnp.where(in_parent, jnp.where(go_left, lid, rid), cur)
        if return_tree:
            upd = qsel & ok[:, None]
            t_feat = jnp.where(upd, bfq[:, None], t_feat)
            t_thr = jnp.where(upd, bbq[:, None], t_thr)
            t_int = jnp.where(upd, 1.0, t_int)
            t_left = jnp.where(upd, lid, t_left)
            t_right = jnp.where(upd, rid, t_right)
            t_vg = t_vg + jnp.where(
                ok[:, None] & (p_iota[None, :] == bfq[:, None]), gq[:, None], 0.0
            )

    value = node_swy / jnp.maximum(node_sw, 1e-12)
    if return_tree:
        return value, cur, (t_feat, t_thr, t_int, t_left, t_right, t_vg)
    return value, cur


def assigned_predict_batched(value, cur, n_total):
    """K-batched ``assigned_predict``: value (K, T), cur (K, n) -> (K, n)."""
    node1h = (cur[:, :, None] == jnp.arange(n_total)[None, None, :]).astype(
        value.dtype
    )
    return jnp.einsum("knt,kt->kn", node1h, value,
                      precision=jax.lax.Precision.HIGHEST)


def build_path_matrices(trees: Tree):
    """Host-side ±1 ancestor-path encoding of best-first trees for the MXU
    prediction path.

    For each tree: P[a, q] = +1 if node q lies in the right subtree of
    internal node a, -1 if left, 0 otherwise; cnt[q] = number of ancestors;
    leaf[q] = 1 for reachable terminal nodes.  A cell lands in leaf q iff its
    ±1 decision vector b satisfies  b · P[:, q] == cnt[q]  — which turns
    leaf assignment into one batched matmul instead of a serial gather walk.
    """
    feat = np.asarray(trees.feat)
    internal = np.asarray(trees.internal)
    left = np.asarray(trees.left)
    right = np.asarray(trees.right)
    t, n = feat.shape
    p_mat = np.zeros((t, n, n), np.float32)
    cnt = np.zeros((t, n), np.float32)
    leaf = np.zeros((t, n), np.float32)
    for ti in range(t):
        # reachable-subtree walk from the root
        stack = [(0, [])]  # (node, [(ancestor, sign), ...])
        while stack:
            q, path = stack.pop()
            for a, s in path:
                p_mat[ti, a, q] = s
            cnt[ti, q] = len(path)
            if internal[ti, q] > 0:
                stack.append((int(left[ti, q]), path + [(q, -1.0)]))
                stack.append((int(right[ti, q]), path + [(q, +1.0)]))
            else:
                leaf[ti, q] = 1.0
    return jnp.asarray(p_mat), jnp.asarray(cnt), jnp.asarray(leaf)


def bestfirst_forest_predict_mxu(
    trees: Tree,
    x,
    weights,
    path_mats=None,
    cell_block: int = 4096,
    tree_chunk: int = 2048,
) -> jax.Array:
    """Gather-free forest prediction as dense MXU algebra — the TPU path for
    boosted ensembles of small trees (gbm's J+1-leaf trees; final models run
    to 10000 trees, V73:493, where serial traversal is hopeless).

    Per (cell block, tree chunk):  decision bits from one (m, p+1) x
    (p+1, T*N) matmul, leaf selection from the batched ±1 path contraction
    (T, m, N) x (T, N, N), prediction from the masked value sum.  All three
    are MXU contractions; no gathers touch the cell axis.
    """
    x = jnp.asarray(x)
    m, p = x.shape
    t_total, n_nodes = trees.feat.shape
    if path_mats is None:
        path_mats = build_path_matrices(trees)
    p_mat, cnt, leaf = path_mats
    w = jnp.asarray(weights, x.dtype)

    # feature one-hot (p, T*N) and flattened thresholds
    f_onehot = (
        (np.asarray(trees.feat)[..., None] == np.arange(p)[None, None, :])
        .astype(np.float32)
        .transpose(2, 0, 1)
        .reshape(p, t_total * n_nodes)
    )
    f_onehot = jnp.asarray(f_onehot)
    thr_flat = trees.thr.reshape(1, t_total * n_nodes).astype(x.dtype)
    wval = trees.value * w[:, None] * leaf                       # (T, N)

    tc = min(tree_chunk, t_total)
    n_tc = -(-t_total // tc)
    t_pad = n_tc * tc - t_total

    def pad_t(a, axis=0):
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, t_pad)
        return jnp.pad(a, widths)

    p_mat_c = pad_t(p_mat).reshape(n_tc, tc, n_nodes, n_nodes)
    cnt_c = pad_t(cnt).reshape(n_tc, tc, n_nodes)
    # padded trees: leaf mask 0 everywhere -> contribute nothing
    wval_c = pad_t(wval).reshape(n_tc, tc, n_nodes)
    f1h_c = pad_t(
        f_onehot.reshape(p, t_total, n_nodes), axis=1
    ).reshape(p, n_tc, tc * n_nodes)
    thr_c = pad_t(
        thr_flat.reshape(t_total, n_nodes)
    ).reshape(n_tc, tc * n_nodes)

    mb = min(cell_block, m) if m else 1
    n_mb = -(-m // mb)
    c_pad = n_mb * mb - m
    xb = jnp.pad(x, ((0, c_pad), (0, 0))).reshape(n_mb, mb, p)

    def cell_body(_, xblk):
        def tree_body(acc, inp):
            f1h, thr, pm, ct, wv = inp
            # HIGHEST: default TPU matmul precision would truncate the
            # feature VALUES to bfloat16 before the threshold compare,
            # flipping decisions near split points (verified on-chip:
            # max error 0.4 on a 2000-tree forest at default precision)
            xv = jnp.dot(
                xblk, f1h,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (mb, tc*N)
            # +-1 decision bits and path matrices are small exact integers:
            # bf16 inputs at f32 accumulation double MXU throughput losslessly
            bits = (2.0 * (xv > thr).astype(jnp.float32) - 1.0).astype(jnp.bfloat16)
            bits = bits.reshape(mb, tc, n_nodes)
            z = jax.lax.dot_general(
                bits.transpose(1, 0, 2), pm.astype(jnp.bfloat16),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                                    # (tc, mb, N)
            sel = (z == ct[:, None, :]).astype(x.dtype)
            # HIGHEST keeps the f32 leaf values un-truncated on TPU
            return acc + jnp.einsum(
                "tmq,tq->m", sel, wv, precision=jax.lax.Precision.HIGHEST
            ), None

        acc, _ = jax.lax.scan(
            tree_body, jnp.zeros((mb,), x.dtype),
            (jnp.moveaxis(f1h_c, 1, 0), thr_c, p_mat_c, cnt_c, wval_c),
        )
        return None, acc

    _, out = jax.lax.scan(cell_body, None, xb)
    return out.reshape(n_mb * mb)[:m]


def tree_assign(tree: Tree, x, depth: int) -> jax.Array:
    """Terminal node id of every (m, p) point (fixed-depth gather loop)."""
    x = jnp.asarray(x)
    m = x.shape[0]

    def body(_, cur):
        f = tree.feat[cur]
        t = tree.thr[cur]
        go = tree.internal[cur] > 0
        xv = jnp.take_along_axis(x, f[:, None], axis=1)[:, 0]
        nxt = jnp.where(xv <= t, tree.left[cur], tree.right[cur])
        return jnp.where(go, nxt, cur)

    return jax.lax.fori_loop(0, depth, body, jnp.zeros((m,), jnp.int32))


def tree_predict(tree: Tree, x, depth: int) -> jax.Array:
    """Route (m, p) points through one tree with a fixed-depth gather loop."""
    return tree.value[tree_assign(tree, x, depth)]


def forest_predict(
    trees: Tree, x, depth: int, weights=None,
    tree_chunk: int = 32, cell_block: int = 65536,
) -> jax.Array:
    """Weighted-sum prediction over a stacked Tree pytree (leading tree axis).

    Both axes are blocked: trees in chunks of ``tree_chunk`` and cells in
    blocks of ``cell_block``, each under ``lax.scan``, so peak memory is
    O(tree_chunk x cell_block x p).  Routing all trees over a full raster
    block at once materialises multi-GB vmap-broadcast intermediates and can
    take down the TPU worker.  ``weights=None`` averages (random forest); a
    weight vector implements shrinkage-scaled boosting sums.
    """
    x = jnp.asarray(x)
    m = x.shape[0]
    t_total = trees.feat.shape[0]
    if weights is None:
        w = jnp.full((t_total,), 1.0 / t_total, x.dtype)
    else:
        w = jnp.asarray(weights, x.dtype)
    chunk = min(tree_chunk, t_total)
    n_chunks = -(-t_total // chunk)
    t_pad = n_chunks * chunk - t_total

    def pad_tree(a):
        widths = [(0, t_pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths).reshape((n_chunks, chunk) + a.shape[1:])

    tc = jax.tree.map(pad_tree, trees)
    wc = jnp.pad(w, (0, t_pad)).reshape(n_chunks, chunk)

    block = min(cell_block, m) if m else 1
    n_blocks = -(-m // block)
    c_pad = n_blocks * block - m
    xb = jnp.pad(x, ((0, c_pad), (0, 0))).reshape(n_blocks, block, x.shape[1])

    def cells_body(_, xblk):
        def trees_body(acc, inp):
            tch, wch = inp
            preds = jax.vmap(lambda t: tree_predict(t, xblk, depth))(tch)
            return acc + jnp.tensordot(wch, preds, axes=1), None

        acc, _ = jax.lax.scan(
            trees_body, jnp.zeros((block,), x.dtype), (tc, wc)
        )
        return None, acc

    _, out = jax.lax.scan(cells_body, None, xb)
    return out.reshape(n_blocks * block)[:m]
