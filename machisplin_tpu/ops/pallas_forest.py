"""Pallas TPU kernel for forest raster prediction via leaf bin-intervals.

Replaces the reference's native tree engines' predict paths — gbm's
C++ traversal (V73:493 final BRT raster predict) and randomForest's
Fortran walk (V73:519) — for the huge-batch raster case (terra::predict,
V73:468/497/521).  Pointer-chasing traversal is hopeless on a TPU and the
earlier dense path-matrix algebra (models/trees.bestfirst_forest_predict_mxu)
is HBM-bound on its (cells, trees, nodes) intermediates.

TPU-first reformulation: every leaf of an axis-aligned tree is a
hyperrectangle, and every split threshold is drawn from the model's
histogram bin edges, so a leaf is an *interval in bin space* per feature:

    x reaches leaf  <=>  for every feature f:  lo[f] <= bin_f(x) <= hi[f]

with bin_f(x) = #{edges_f < x}.  Prediction per cell block is then pure
dense algebra with NO gathers and no per-tree matmuls:

  * bin indices: (cells, B) compares + row-sum on the VPU per feature;
  * leaf membership: two broadcast compares against the (F, leaves) lo/hi
    tables, AND-accumulated over features on the VPU (F = features rounded
    up to the 8-sublane granule, so any covariate-stack width works —
    terra::predict handles arbitrary stacks, V73:468);
  * the weighted leaf-value reduction: one (cells, leaves) x (leaves, 1)
    MXU matvec.

Everything stays 2D (Mosaic rejects in-kernel reshapes); leaf tables
stream through VMEM in chunks while each cell block's selection mask
never touches HBM.  The interval tables are built once per forest on the
host (the same reachable-subtree walk as build_path_matrices).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["LeafBinTables", "build_leaf_bins", "forest_predict_bins"]

_CELL_BLOCK = 2048       # dense-fallback (CPU) padding granule
_CELL_BLOCK_TPU = 8192   # measured winner (forest_predicate_sweep.json 3d)
_LEAF_CHUNK = 512
_FEAT_GRANULE = 8  # f32 sublane granule; feature axis pads up to a multiple
# measured default for the predicated feature loop: STAYS False — the
# on-chip A/B (benchmarks/forest_predicate_sweep.json) measured the
# lax.cond-carried variant at 6 Mcells/s vs 29.8 unpredicated (the (tn, mb)
# carry copies in/out of each branch, costing far more than the skipped
# compares save), and cb=8192 variants crashed the Mosaic compile.  The
# branch-free alternative is the static-segment path below (`segments`).
_PREDICATE_DEFAULT = False
# measured default for the static-segment path: ON for the pallas path —
# the round-4 on-chip A/B (benchmarks/forest_predicate_sweep.json, phase
# 3d) measured drop-leaf tables + segments at 40.7 Mcells/s vs 21.5 for
# the phase-1 baseline (cb=8192/lc=1024/ms=12, full tables) and 19.6 for
# the round-3 default — checksums exact throughout.  Absolute rates on the
# tunnel vary ~1.5x between sessions; an interleaved best-of-5 rerun on a
# slower day confirmed the ORDERING (drop-seg 27.5 > drop-base 25.5 >
# full-base 21.4) even when the winner's absolute rate was down.  The
# dense fallback ignores it (guarded by use_pallas).
_SEGMENTS_DEFAULT = True
_MAX_SEGMENTS = 24


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class LeafBinTables(NamedTuple):
    """Host-built bin-space leaf geometry of one forest (weight-free)."""

    etab: np.ndarray      # (F_pad, B_pad) f32 per-feature sorted edges, +inf pad
    lo: np.ndarray        # (F_pad, TL_pad) f32 per-feature lower bin bound
    hi: np.ndarray        # (F_pad, TL_pad) f32 upper bound (pad slots lo=1,hi=0)
    leaf_tree: np.ndarray  # (TL_pad,) int32 tree id of each leaf slot (-1 pad)
    leaf_node: np.ndarray  # (TL_pad,) int32 node id of each leaf slot (0 pad)
    n_feat: int           # real feature count p
    n_bins: int           # B (edges + 1) before lane padding
    # drop-leaf trick (None = off): node id of ONE leaf per tree excluded
    # from the slot tables.  A tree's leaves partition bin space
    # (sum_l sel_l == 1 per cell), so  sum_l w v_l sel_l ==
    # sum_{l != drop} w (v_l - v_drop) sel_l + w v_drop:  the dropped
    # leaf's value folds into a per-response constant and its membership
    # work vanishes — 25% of all slots for the 4-leaf best-first BRTs of
    # the reference's final models (V73:493).  Exact up to one f32
    # add/sub rounding per leaf value.
    drop_node: np.ndarray | None = None  # (T,) int32


def build_leaf_bins(
    trees, n_feat: int | None = None, drop_leaf: bool = True
) -> LeafBinTables:
    """Walk every tree's reachable subtree and emit leaf bin-intervals.

    trees: a models.trees.Tree pytree of concrete arrays with a leading
    tree axis — feat/thr/internal/left/right (T, N).

    ``drop_leaf``: exclude one leaf per tree from the slot tables (see
    LeafBinTables.drop_node) — the leaf with the MOST constrained
    features, so the survivors are the shallow ones and the
    constrained-feature-set sort below yields tighter segment unions too.
    forest_predict_bins folds the dropped values into a constant.
    """
    feat = np.asarray(trees.feat)
    thr = np.asarray(trees.thr)
    internal = np.asarray(trees.internal)
    left = np.asarray(trees.left)
    right = np.asarray(trees.right)
    t, n_nodes = feat.shape
    p = int(n_feat if n_feat is not None else feat.max() + 1)
    f_pad = _round_up(p, _FEAT_GRANULE)

    # per-feature sorted unique thresholds over all internal nodes
    int_mask = internal > 0
    edges = [np.unique(thr[int_mask & (feat == f)]) for f in range(p)]
    n_edges = max((len(e) for e in edges), default=0)
    n_bins = n_edges + 1
    b_pad = _round_up(max(n_edges, 1), 128)
    etab = np.full((f_pad, b_pad), np.inf, np.float32)
    for f in range(p):
        etab[f, : len(edges[f])] = edges[f]

    los, his, l_tree, l_node = [], [], [], []
    drop_node = np.zeros(t, np.int32) if drop_leaf else None
    for ti in range(t):
        tree_leaves = []
        stack = [(0, np.zeros(p, np.int64), np.full(p, n_bins - 1, np.int64))]
        while stack:
            q, lo_q, hi_q = stack.pop()
            if int_mask[ti, q]:
                f = int(feat[ti, q])
                k = int(np.searchsorted(edges[f], thr[ti, q]))
                lo_l, hi_l = lo_q.copy(), hi_q.copy()
                hi_l[f] = min(hi_l[f], k)          # left: x <= thr <=> bin <= k
                lo_r, hi_r = lo_q.copy(), hi_q.copy()
                lo_r[f] = max(lo_r[f], k + 1)      # right: bin >= k + 1
                stack.append((int(left[ti, q]), lo_l, hi_l))
                stack.append((int(right[ti, q]), lo_r, hi_r))
            else:
                tree_leaves.append((q, lo_q, hi_q))
        if drop_leaf:
            ncons = [
                int(np.count_nonzero((lo_q > 0) | (hi_q < n_bins - 1)))
                for _, lo_q, hi_q in tree_leaves
            ]
            di = int(np.argmax(ncons))
            drop_node[ti] = tree_leaves[di][0]
            del tree_leaves[di]
        for q, lo_q, hi_q in tree_leaves:
            los.append(lo_q)
            his.append(hi_q)
            l_tree.append(ti)
            l_node.append(q)

    n_leaves = len(l_tree)
    l_tree = np.asarray(l_tree, np.int32)
    l_node = np.asarray(l_node, np.int32)
    if n_leaves:
        lo_real = np.stack(los, axis=1).astype(np.float32)   # (p, L)
        hi_real = np.stack(his, axis=1).astype(np.float32)
        if p < 63:
            # sort leaf slots by constrained-feature set so each leaf CHUNK
            # touches few features: a leaf at depth d constrains <= d of the
            # p features (the rest stay at the trivial [0, B-1] interval),
            # and the kernel's predicated feature loop (below) skips a
            # feature for a whole chunk when NO leaf in it constrains that
            # feature.  Grouping by (popcount, bitmask) makes chunks
            # near-homogeneous, so the skip actually fires.  Pure
            # permutation — leaf_tree/leaf_node carry the weights.
            cons = (lo_real > 0) | (hi_real < n_bins - 1)    # (p, L)
            mask_int = (cons * (1 << np.arange(p, dtype=np.int64))[:, None]).sum(0)
            order = np.lexsort((mask_int, cons.sum(0)))
            lo_real = lo_real[:, order]
            hi_real = hi_real[:, order]
            l_tree = l_tree[order]
            l_node = l_node[order]
    tl_pad = _round_up(max(n_leaves, 1), _LEAF_CHUNK)
    # padding slots: EMPTY on feature 0 only (lo=1 > hi=0 can never match);
    # all other features stay unconstrained so pad chunks don't force the
    # predicated loop to visit every feature
    lo = np.zeros((f_pad, tl_pad), np.float32)
    hi = np.full((f_pad, tl_pad), float(n_bins - 1), np.float32)
    lo[0, :] = 1.0
    hi[0, :] = 0.0
    if n_leaves:
        lo[:p, :n_leaves] = lo_real
        hi[:p, :n_leaves] = hi_real
    leaf_tree = np.full(tl_pad, -1, np.int32)
    leaf_node = np.zeros(tl_pad, np.int32)
    leaf_tree[:n_leaves] = l_tree
    leaf_node[:n_leaves] = l_node
    return LeafBinTables(etab, lo, hi, leaf_tree, leaf_node, p, n_bins,
                         drop_node)


def _kernel(etab_ref, x_ref, lo_ref, hi_ref, wv_ref, *rest,
            p_real, mdtype, predicate=False, p_list=None):
    """One (cell block, leaf chunk) tile: membership AND-product + matvec.

    Layout: cells ride the LANE axis throughout — bin indices are (1, mb),
    membership masks (tn, mb), and each program writes a (1, mb) output
    row, so the flat surface ships with zero tile-padding waste (a
    cells-on-sublanes layout would pad the 1-wide trailing axis to 128
    lanes: 128x the surface in HBM).  Bin indices are computed once per
    cell block into VMEM scratch (the leaf-chunk axis is innermost, so
    scratch persists across its steps) rather than once per leaf chunk.

    ``mdtype``: the membership-algebra dtype.  bfloat16 is EXACT here —
    every quantity is a small integer (bin indices and interval bounds are
    <= b_pad <= 256, masks are 0/1, and bf16 represents integers to 256
    exactly; the bin-index SUM runs in f32 before the cast) — while
    halving the (tn, mb) mask traffic, the kernel's dominant cost.  The
    final leaf-value matvec always accumulates in f32 (values are the
    precision-doctrine path).

    ``predicate``: when True, ``rest`` carries an SMEM (1, 1, f_pad) int32
    activity row for this leaf chunk (see build_leaf_bins' feature-set
    sort) and each feature's compare-AND is wrapped in lax.cond — a chunk
    whose leaves never constrain feature f skips its (tn, mb) VPU work
    entirely.  Exact but MEASURED SLOW on chip (the vector carry copies
    per branch; see _PREDICATE_DEFAULT) — kept for the record.

    ``p_list``: the branch-free alternative — a STATIC tuple of feature
    indices this call's leaf chunks actually constrain (the segment path:
    _predict_impl slices the sorted leaf axis into contiguous chunk runs
    with a shared active-feature union and compiles one variant per
    distinct union).  Exact for the same reason as predicate.
    """
    if predicate:
        act_ref, out_ref, bins_ref = rest
    else:
        out_ref, bins_ref = rest
    feats = tuple(range(p_real)) if p_list is None else p_list
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        for f in feats:
            bins_ref[f : f + 1, :] = jnp.sum(
                (x_ref[f : f + 1, :] > etab_ref[:, f : f + 1]).astype(jnp.float32),
                axis=0,
                keepdims=True,
            ).astype(mdtype)

    def _ok(f):
        # the COMPARES run in f32: Mosaic on v5e rejects packed-bf16 cmpf
        # ("Target does not support this comparison", observed round 4).
        # bf16's win is the STREAMED/STORED operands — the lo/hi tables,
        # the bins scratch, and the (tn, mb) sel mask — not the compare op.
        binf = bins_ref[f : f + 1, :].astype(jnp.float32)     # (1, mb)
        return (
            (binf >= lo_ref[:, f : f + 1].astype(jnp.float32))
            & (binf <= hi_ref[:, f : f + 1].astype(jnp.float32))
        ).astype(mdtype)                                      # (tn, mb)

    if predicate:
        sel = jnp.ones((lo_ref.shape[0], x_ref.shape[1]), mdtype)
        for f in feats:
            sel = jax.lax.cond(
                act_ref[0, 0, f] > 0,
                lambda s, f=f: s * _ok(f),
                lambda s: s,
                sel,
            )
    else:
        # min-slack accumulation: lo <= bin <= hi  <=>  min over features of
        # min(bin - lo, hi - bin) >= 0, so the chain is 4 plain f32 VPU ops
        # per feature tile (sub, sub, min, min-accumulate) plus ONE compare+
        # cast per chunk, vs 5 for the compare/AND/cast/multiply form.  All
        # quantities are small integers, so every sub/min is exact in f32
        # (and in bf16 to 256).  A boolean-AND accumulation (i1 masks, one
        # trailing cast) was measured 40% SLOWER on chip — Mosaic's mask
        # vregs cost more than the f32 ops they replace (sweep 3b,
        # benchmarks/forest_predicate_sweep_phase3b.json).
        slack = None
        for f in feats:
            binf = bins_ref[f : f + 1, :].astype(jnp.float32)
            t = jnp.minimum(
                binf - lo_ref[:, f : f + 1].astype(jnp.float32),
                hi_ref[:, f : f + 1].astype(jnp.float32) - binf,
            )                                                 # (tn, mb)
            slack = t if slack is None else jnp.minimum(slack, t)
        if slack is None:  # a segment of unconstrained leaves matches all
            sel = jnp.ones((lo_ref.shape[0], x_ref.shape[1]), mdtype)
        else:
            sel = (slack >= 0.0).astype(mdtype)
    # leaf VALUES stay f32 (precision doctrine): the exact 0/1 mask upcasts
    # for the matvec — same masks as the all-f32 kernel, agreeing to the
    # f32 dot's accumulation order.  wv carries one row per output column
    # (R responses share the membership algebra; see build_leaf_bins_multi)
    contrib = jnp.dot(
        wv_ref[:], sel.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                         # (R, mb)

    @pl.when(j == 0)
    def _():
        out_ref[:] = contrib

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + contrib


def _segments_for(lo, hi, n_bins, p_real, leaf_chunk,
                  max_segments=_MAX_SEGMENTS):
    """Host-side: contiguous leaf-chunk runs sharing an active-feature union.

    ``lo``/``hi`` are the CONCRETE (f_pad, TL_pad) tables (build_leaf_bins
    sorts leaf slots by constrained-feature set, so equal-set runs are
    long).  Returns a static tuple of (chunk_start, chunk_end, p_list);
    adjacent runs greedy-merge (minimum added membership cost) until at
    most ``max_segments`` remain — each distinct p_list is one compiled
    kernel variant.
    """
    lo = np.asarray(lo)
    hi = np.asarray(hi)
    cons = (lo[:p_real] > 0) | (hi[:p_real] < n_bins - 1)     # (p, TL)
    n_chunks = lo.shape[1] // leaf_chunk
    act = cons.reshape(p_real, n_chunks, leaf_chunk).any(axis=2)
    segs: list = []                                           # [c0, c1, set]
    for c in range(n_chunks):
        m = frozenset(np.nonzero(act[:, c])[0].tolist())
        if segs and segs[-1][2] == m:
            segs[-1][1] = c + 1
        else:
            segs.append([c, c + 1, m])

    def cost(c0, c1, m):
        return (c1 - c0) * max(len(m), 1)

    while len(segs) > max_segments:
        best_i, best_d = 0, None
        for i in range(len(segs) - 1):
            a, b = segs[i], segs[i + 1]
            u = a[2] | b[2]
            d = cost(a[0], b[1], u) - cost(*a) - cost(*b)
            if best_d is None or d < best_d:
                best_i, best_d = i, d
        a, b = segs[best_i], segs.pop(best_i + 1)
        a[1], a[2] = b[1], a[2] | b[2]
    return tuple((s[0], s[1], tuple(int(f) for f in sorted(s[2]))) for s in segs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "p_real", "m_real", "use_pallas", "interpret", "membership_dtype",
        "cell_block", "leaf_chunk", "n_bins", "predicate", "segments",
    ),
)
def _predict_impl(etab, x_pad, lo, hi, wv, offset, *, p_real, m_real, use_pallas,
                  interpret=False, membership_dtype="float32",
                  cell_block=_CELL_BLOCK, leaf_chunk=_LEAF_CHUNK,
                  n_bins=0, predicate=False, segments=None):
    m_pad = x_pad.shape[0]
    tl_pad = lo.shape[1]
    n_out = wv.shape[1]
    if not use_pallas:
        # jnp twin of the kernel (CPU tests / non-TPU backends)
        bins = jnp.sum(
            x_pad[:, :p_real, None] > etab[None, :p_real, :], axis=2
        ).astype(jnp.float32)                                 # (m, p)
        ok = (bins[:, :, None] >= lo[None, :p_real, :]) & (
            bins[:, :, None] <= hi[None, :p_real, :]
        )
        sel = jnp.all(ok, axis=1).astype(jnp.float32)         # (m, TL)
        return (sel @ wv)[:m_real] + offset[None, :]          # (m, R)

    mdtype = jnp.dtype(membership_dtype)
    b_pad = etab.shape[1]
    f_pad = x_pad.shape[1]
    while tl_pad % leaf_chunk:  # tables pad to _LEAF_CHUNK multiples
        leaf_chunk //= 2
    lo_t = lo.T.astype(mdtype)                                # (TL, f_pad)
    hi_t = hi.T.astype(mdtype)
    wv_t = wv.T                                               # (R, TL)

    def one_call(lo_s, hi_s, wv_s, p_list):
        n_chunks = lo_s.shape[0] // leaf_chunk
        n_feat_eff = p_real if p_list is None else max(len(p_list), 1)
        kernel = functools.partial(
            _kernel, p_real=p_real, mdtype=mdtype, predicate=predicate,
            p_list=p_list,
        )
        in_specs = [
            pl.BlockSpec(
                (b_pad, f_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (f_pad, cell_block), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (leaf_chunk, f_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (leaf_chunk, f_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_out, leaf_chunk), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
        ]
        args = [etab.T, x_pad.T, lo_s, hi_s, wv_s]
        if predicate:
            # per-chunk feature activity (see build_leaf_bins' feature-set
            # sort): a feature is live for a chunk iff ANY leaf constrains it
            cons = (lo_s > 0) | (hi_s < float(n_bins - 1))    # (TL_s, f_pad)
            act = cons.reshape(n_chunks, leaf_chunk, f_pad).any(axis=1)
            # (n_chunks, 1, f_pad): the LAST TWO dims of the SMEM block must
            # equal the array dims (TPU lowering divisibility rule), so the
            # chunk axis rides a leading dim blocked at 1
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, f_pad), lambda i, j: (j, 0, 0),
                    memory_space=pltpu.SMEM,
                )
            )
            args.append(act.astype(jnp.int32)[:, None, :])
        tl_s = lo_s.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(m_pad // cell_block, n_chunks),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (n_out, cell_block), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_out, m_pad), jnp.float32),
            scratch_shapes=[pltpu.VMEM((f_pad, cell_block), mdtype)],
            cost_estimate=pl.CostEstimate(
                flops=4 * m_pad * tl_s * n_feat_eff + 2 * n_out * m_pad * tl_s,
                bytes_accessed=4 * (
                    m_pad * f_pad + 3 * tl_s * f_pad + n_out * m_pad
                ),
                transcendentals=0,
            ),
            interpret=interpret,
        )(*args)

    if segments is None:
        out = one_call(lo_t, hi_t, wv_t, None)
    else:
        # branch-free feature skipping: one pallas_call per contiguous
        # chunk run, compiled with the run's STATIC active-feature union
        # (the leaf axis is sorted by constrained-feature set, so runs are
        # long and unions small for shallow trees)
        out = None
        for c0, c1, p_list in segments:
            a, b = c0 * leaf_chunk, c1 * leaf_chunk
            part = one_call(lo_t[a:b], hi_t[a:b], wv_t[:, a:b], p_list)
            out = part if out is None else out + part
    return (out[:, :m_real] + offset[:, None]).T              # (m, R)


def forest_predict_bins(
    trees, x, weights, tables: LeafBinTables | None = None,
    use_pallas: bool | None = None, interpret: bool = False,
    membership_dtype: str = "float32",
    cell_block: int | None = None, leaf_chunk: int = _LEAF_CHUNK,
    predicate: bool | None = None, segments: bool | None = None,
    max_segments: int = _MAX_SEGMENTS,
) -> jax.Array:
    """Weighted forest prediction sum_t w_t * tree_t(x) for (m, p) inputs.

    ``weights`` may be traced (e.g. lr * active-tree mask); the bin-interval
    tables are weight-independent, so pass precomputed ``tables`` when
    predicting many blocks from one forest.

    ``weights`` may also be (T, R): R weighted reductions of the SAME tree
    pool in one pass -> (m, R).  The membership algebra (the kernel's
    dominant cost for a single response... and shared entirely here) runs
    once; only the final matvec widens.  This is how the response-batched
    gbm.step final models predict every response's raster in ONE grid
    stream (pipeline/mltps + build_leaf_bins on the stacked tree pool).

    ``membership_dtype``: dtype of the kernel's STORED membership operands
    (lo/hi tables, bins scratch, sel mask; compares always run in f32 —
    Mosaic v5e has no packed-bf16 cmpf).  bfloat16 is EXACT here (bin
    indices/bounds are integers <= 256, masks are 0/1; the value matvec
    stays f32 — see _kernel) and halves that traffic; the default stays
    float32 until the on-chip sweep (benchmarks/forest_kernel_sweep.py)
    blesses bf16 as faster with checksums intact.  ``cell_block``/
    ``leaf_chunk`` are tuning knobs for the kernel sweep.

    ``predicate``/``segments``: two exact mechanisms for skipping a
    feature's (leaf-chunk x cell-block) compare tile when no leaf in the
    chunk constrains it (build_leaf_bins sorts leaf slots by
    constrained-feature set precisely so these skips fire — shallow trees
    constrain <= depth of the p features).  ``predicate`` branches at
    runtime via lax.cond (measured 5x SLOWER on chip — the vector carry
    copies per branch; kept for the record); ``segments`` compiles one
    pallas_call per contiguous chunk run with the run's STATIC feature
    union (no branches).  None = the measured defaults (on-chip A/B in
    benchmarks/forest_predicate_sweep.py).  Both need concrete tables.
    """
    x = jnp.asarray(x, jnp.float32)
    m, p = x.shape
    if tables is None:
        tables = build_leaf_bins(trees, n_feat=p)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if cell_block is None:
        # the pallas kernel wants big blocks (8192 measured best on v5e);
        # the dense fallback pads m up to cell_block, so keep it small there
        cell_block = _CELL_BLOCK_TPU if use_pallas else _CELL_BLOCK
    if predicate is None:
        predicate = _PREDICATE_DEFAULT
    if segments is None:
        segments = _SEGMENTS_DEFAULT
    if jnp.dtype(membership_dtype) == jnp.bfloat16 and tables.n_bins > 256:
        membership_dtype = "float32"  # bf16 integers are exact only to 256

    w = jnp.asarray(weights, jnp.float32)
    single = w.ndim == 1
    wcols = w[:, None] if single else w                       # (T, R)
    # weighted value of each leaf slot; padded slots (tree -1) get weight 0
    leaf_val = trees.value[tables.leaf_tree, tables.leaf_node]  # (TL,)
    leaf_w = jnp.where(
        (tables.leaf_tree >= 0)[:, None],
        wcols[jnp.clip(tables.leaf_tree, 0, None)], 0.0,
    )                                                          # (TL, R)
    if tables.drop_node is not None:
        # drop-leaf algebra (see LeafBinTables.drop_node): slot values are
        # relative to the tree's dropped leaf; the dropped values enter as
        # a per-response constant.  Pad slots carry zero weight, so their
        # shift is harmless.
        tw = int(tables.drop_node.shape[0])
        vdrop = trees.value[jnp.arange(tw), jnp.asarray(tables.drop_node)]
        leaf_val = leaf_val - vdrop[jnp.clip(tables.leaf_tree, 0, tw - 1)]
        offset = jnp.asarray(vdrop, jnp.float32) @ wcols[:tw].astype(
            jnp.float32
        )                                                      # (R,)
    else:
        offset = jnp.zeros((wcols.shape[1],), jnp.float32)
    wv = (leaf_val[:, None] * leaf_w).astype(jnp.float32)

    seg_spec = None
    if segments and use_pallas:
        lc = leaf_chunk
        while tables.lo.shape[1] % lc:
            lc //= 2
        seg_spec = _segments_for(
            tables.lo, tables.hi, tables.n_bins, tables.n_feat, lc,
            max_segments=max_segments,
        )
    m_pad = _round_up(max(m, 1), cell_block)
    x_pad = jnp.pad(x, ((0, m_pad - m), (0, tables.etab.shape[0] - p)))
    out = _predict_impl(
        jnp.asarray(tables.etab),
        x_pad,
        jnp.asarray(tables.lo),
        jnp.asarray(tables.hi),
        wv,
        offset,
        p_real=tables.n_feat,
        m_real=m,
        use_pallas=use_pallas,
        interpret=interpret,
        membership_dtype=membership_dtype,
        cell_block=cell_block,
        leaf_chunk=leaf_chunk,
        n_bins=tables.n_bins,
        predicate=predicate,
        segments=seg_spec,
    )
    return out[:, 0] if single else out
