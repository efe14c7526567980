"""Fused Pallas TPU kernel: one best-first boosting-tree step per chain.

gbm.step's CV phase is the pipeline's dominant cost (the reference's HOT
LOOP #1 — the per-fold gbm::gbm grow loops behind V73:225-319).  The TPU
reformulation grows all (response x outer x inner) chains in lockstep, but
as XLA ops the split step is LATENCY-bound, not compute-bound: the round-5
on-chip ablation (artifacts/round5/SPLIT_STEP_ABLATION.json) measured the
cumsum+gain+argmax chain at 124 of the 136 us per split on tensors of a few
hundred KB — ~25 tiny ops serialised at this runtime's ~5 us/op floor, and
shrinking the data 8x moved nothing.

This kernel erases the op count instead of the bytes: the ENTIRE tree —
root scoring, ``n_splits`` best-first split steps, leaf values, and the
boosting update ``f + lr * value[cur]`` — runs as ONE kernel launch.  Per
split step inside the kernel:

  * cumulative split stats in one MXU contraction against the shared
    ``flat_bin_cum_onehot`` table (bf16 hi+lo A-side, exact 0/1 B-side —
    the sanctioned gbm histogram accuracy class, models/trees.py), which
    eliminates the histogram cumsum entirely (left stats arrive
    cumulative; right = total - left);
  * node totals as exact f32 row-sums, so leaf values stay on the exact
    path (creation-time child totals — a leaf's member set never changes
    after its creation);
  * argmaxes via the max + int-iota-min trick (Mosaic has no argmax), all
    node bookkeeping as full-width lane-mask selects (the child slots of
    step k are the compile-time lanes 2k+1 / 2k+2 — the loop is a static
    unroll, so no traced-index scatters ever touch the ref).

Semantics are exactly ``models.trees.grow_bestfirst_trees_cumshared``
(the jnp twin, used as the CPU fallback and the equivalence oracle in
tests/test_pallas_grow.py) followed by ``f + lr * value[cur]``.

Mosaic constraints honoured (see CLAUDE.md): no in-kernel reshapes or
transposes (the one-hot stays flat (n, p*nb); the feature axis of the
binned data arrives pre-transposed (p, n)); iota only via 2D
``broadcasted_iota``; -inf stood in by a finite -3e38 (only ever compared
against 1e-9 / max-reduced).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gbm_tree_update", "gbm_tree_update_ref"]

_NEG = -3.0e38                  # finite -inf stand-in (Mosaic-safe)
# measured winner at the production CV shape (200 chains, n=813):
# cb=104 0.214 ms/tree vs cb=64 0.300 / cb=128 0.483 (VMEM-pressure spills)
# — artifacts/round5/GROW_KERNEL_BENCH.json; cb=200 OOMs scoped vmem
_CHAIN_BLOCK = 104
# empirical scoped-VMEM model from the cb=200 OOM (20.23M at n=813,
# L=320): ~120 B per chain per row of live unrolled-loop intermediates
# plus the resident one-hot
_VMEM_BUDGET = 14e6
_BYTES_PER_CHAIN_ROW = 120


def _lane_min_index(eq, length):
    """First lane index where ``eq`` holds, else ``length`` — (rows, 1)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, eq.shape, 1)
    return jnp.min(jnp.where(eq, iota, length), axis=1, keepdims=True)


def _tree_kernel(
    xbt_ref, cum_ref, y_ref, f_ref, w_ref, out_ref, *tree_refs,
    n_splits, nb, p, min_leaf, lr,
):
    """``tree_refs`` (optional, emit_tree): feat, thr_bin, internal, left,
    right, value output refs — the flat-array Tree encoding of
    models/trees.py, for final fits whose forests must predict rasters."""
    c, n = w_ref.shape
    lcols = p * nb
    n_total = 2 * n_splits + 1
    f = f_ref[...]
    ws = w_ref[...]
    ys = y_ref[...] - f                    # boosting residuals
    wys = ws * ys
    cumb = cum_ref[...]                    # (n, p*nb) bf16, 0/1 exact
    xbt = xbt_ref[...].astype(jnp.bfloat16)  # (p, n) bins < 256: exact bf16

    dn = (((1,), (0,)), ((), ()))

    def hist_cum(a):
        """(rows, n) f32 @ cumulative one-hot -> (rows, p*nb) f32 ~1e-5 rel
        (bf16 hi+lo A-side x exact 0/1 B-side — gain stats only).
        Precision is pinned to DEFAULT: callers run under the
        highest_precision context (utils/precision.py) and Mosaic rejects
        fp32 contract precision on bf16 operands ("Bad lhs type") — the
        hi+lo split IS this dot's precision story."""
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        hi = jax.lax.dot_general(
            a_hi, cumb, dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        lo = jax.lax.dot_general(
            a_lo, cumb, dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        return hi + lo

    pos_l = jax.lax.broadcasted_iota(jnp.int32, (c, lcols), 1)
    binpos = pos_l - (pos_l // nb) * nb

    def best_from_cum(clw, clwy, tw, twy):
        """(c, p*nb) cumulative stats + (c, 1) totals -> best gain/feat/bin."""
        eps = 1e-12
        rw = tw - clw
        rwy = twy - clwy
        gain = (
            clwy * clwy / jnp.maximum(clw, eps)
            + rwy * rwy / jnp.maximum(rw, eps)
            - twy * twy / jnp.maximum(tw, eps)
        )
        valid = (clw >= min_leaf) & (rw >= min_leaf) & (binpos < nb - 1)
        gain = jnp.where(valid, gain, _NEG)
        m = jnp.max(gain, axis=1, keepdims=True)
        idx = _lane_min_index(gain == m, lcols)
        feat = idx // nb
        return m, feat, idx - feat * nb

    # --- root scoring --------------------------------------------------
    croot = hist_cum(jnp.concatenate([ws, wys], axis=0))     # (2c, L)
    tw0 = jnp.sum(ws, axis=1, keepdims=True)                 # exact totals
    twy0 = jnp.sum(wys, axis=1, keepdims=True)
    g0, f0, b0 = best_from_cum(croot[:c], croot[c:], tw0, twy0)

    lanes_t = jax.lax.broadcasted_iota(jnp.int32, (c, n_total), 1)
    at_root = lanes_t == 0
    node_gain = jnp.where(at_root, g0, _NEG)
    node_feat = jnp.where(at_root, f0, 0)
    node_bin = jnp.where(at_root, b0, 0)
    node_sw = jnp.where(at_root, tw0, 0.0)
    node_swy = jnp.where(at_root, twy0, 0.0)
    cur = jnp.zeros((c, n), jnp.int32)
    lanes_p = jax.lax.broadcasted_iota(jnp.int32, (c, p), 1)
    if tree_refs:
        t_feat = jnp.zeros((c, n_total), jnp.int32)
        t_thr = jnp.zeros((c, n_total), jnp.int32)
        t_int = jnp.zeros((c, n_total), jnp.float32)
        t_left = jnp.zeros((c, n_total), jnp.int32)
        t_right = jnp.zeros((c, n_total), jnp.int32)
        t_vg = jnp.zeros((c, p), jnp.float32)

    # --- n_splits best-first steps (static unroll: child slots 2k+1/2k+2
    # are compile-time lanes) --------------------------------------------
    for k in range(n_splits):
        gq = jnp.max(node_gain, axis=1, keepdims=True)       # (c, 1)
        q = _lane_min_index(node_gain == gq, n_total)
        ok = gq > 1e-9
        qsel = lanes_t == q
        bfq = jnp.sum(jnp.where(qsel, node_feat, 0), axis=1, keepdims=True)
        bbq = jnp.sum(jnp.where(qsel, node_bin, 0), axis=1, keepdims=True)
        fsel = (lanes_p == bfq).astype(jnp.bfloat16)         # (c, p)
        sample_bin = jax.lax.dot_general(
            fsel, xbt, dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,             # exact: 0/1 x ints
        )                                                    # (c, n)
        in_parent = ok & (cur == q)
        go_left = in_parent & (sample_bin <= bbq.astype(jnp.float32))
        lm = go_left.astype(jnp.float32)
        pm = in_parent.astype(jnp.float32)
        h = hist_cum(
            jnp.concatenate([ws * lm, wys * lm, ws * pm, wys * pm], axis=0)
        )                                                    # (4c, L)
        clw, clwy = h[:c], h[c : 2 * c]
        cpw, cpwy = h[2 * c : 3 * c], h[3 * c :]
        tl_w = jnp.sum(ws * lm, axis=1, keepdims=True)       # exact totals
        tp_w = jnp.sum(ws * pm, axis=1, keepdims=True)
        tl_wy = jnp.sum(wys * lm, axis=1, keepdims=True)
        tp_wy = jnp.sum(wys * pm, axis=1, keepdims=True)
        gl, fl, bl = best_from_cum(clw, clwy, tl_w, tl_wy)
        gr, fr, br = best_from_cum(cpw - clw, cpwy - clwy, tp_w - tl_w, tp_wy - tl_wy)
        lid, rid = 2 * k + 1, 2 * k + 2
        is_l = lanes_t == lid
        is_r = lanes_t == rid
        node_gain = jnp.where(qsel, _NEG, node_gain)
        node_gain = jnp.where(is_l, jnp.where(ok, gl, _NEG), node_gain)
        node_gain = jnp.where(is_r, jnp.where(ok, gr, _NEG), node_gain)
        node_feat = jnp.where(is_l, fl, jnp.where(is_r, fr, node_feat))
        node_bin = jnp.where(is_l, bl, jnp.where(is_r, br, node_bin))
        node_sw = jnp.where(
            is_l, jnp.where(ok, tl_w, 0.0),
            jnp.where(is_r, jnp.where(ok, tp_w - tl_w, 0.0), node_sw),
        )
        node_swy = jnp.where(
            is_l, jnp.where(ok, tl_wy, 0.0),
            jnp.where(is_r, jnp.where(ok, tp_wy - tl_wy, 0.0), node_swy),
        )
        cur = jnp.where(in_parent, jnp.where(go_left, lid, rid), cur)
        if tree_refs:
            upd = qsel & ok
            t_feat = jnp.where(upd, bfq, t_feat)
            t_thr = jnp.where(upd, bbq, t_thr)
            t_int = jnp.where(upd, 1.0, t_int)
            t_left = jnp.where(upd, lid, t_left)
            t_right = jnp.where(upd, rid, t_right)
            t_vg = t_vg + jnp.where(ok & (lanes_p == bfq), gq, 0.0)

    # --- leaf values + boosting update ----------------------------------
    value = node_swy / jnp.maximum(node_sw, 1e-12)           # (c, n_total)
    pred = jnp.zeros((c, n), jnp.float32)
    for t in range(n_total):                 # value[cur] without a gather
        v_t = jnp.sum(jnp.where(lanes_t == t, value, 0.0), axis=1, keepdims=True)
        pred = jnp.where(cur == t, v_t, pred)
    out_ref[...] = f + lr * pred
    if tree_refs:
        tree_refs[0][...] = t_feat
        tree_refs[1][...] = t_thr
        tree_refs[2][...] = t_int
        tree_refs[3][...] = t_left
        tree_refs[4][...] = t_right
        tree_refs[5][...] = value
        tree_refs[6][...] = t_vg


def gbm_tree_update(
    xbt, cum1h, y, f, w,
    *, n_splits: int, nb: int, min_leaf: float, lr: float,
    chain_block: int = _CHAIN_BLOCK, use_pallas: bool | None = None,
    interpret: bool = False, emit_tree: bool = False,
):
    """Advance every boosting chain by one best-first tree: returns
    ``f + lr * value[cur]`` with the tree grown by the fused kernel.

    xbt (p, n) f32: GLOBALLY binned data, transposed (bins as values —
    exact in bf16 while nb <= 256); cum1h (n, p*nb) bf16 cumulative
    one-hot (``flat_bin_cum_onehot``); y/f/w (C, n) f32 per-chain targets,
    current fits, bag weights (0 = out-of-bag).  All chains share xbt and
    cum1h — the global-bins layout (models/gbm_step.py ``global_bins``).

    Chains pad up to ``chain_block`` and ride a 1-D grid (zero-weight pad
    chains grow no splits and predict 0).  Falls back to the jnp twin off
    TPU (``use_pallas=None`` auto-detects) — same selections, same values.

    ``emit_tree``: additionally return the grown trees' flat arrays —
    feat, thr_bin, internal, left, right, value (each (C, 2*n_splits+1))
    and var_gain (C, p) — final fits keep their forests for raster
    prediction and importance reporting (V73:468/493/519); thr_bin holds
    BIN indices (translate via trees._edges_lookup).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    p, n = xbt.shape
    c_total = f.shape[0]
    n_total = 2 * n_splits + 1
    # cap the chain block to the scoped-VMEM budget; when even 8 chains
    # don't fit (large n), the jnp twin — itself 8x the round-4 grower —
    # takes over
    cb_fit = int((_VMEM_BUDGET - 2 * n * p * nb) // (_BYTES_PER_CHAIN_ROW * n))
    if not (use_pallas or interpret) or (cb_fit < 8 and not interpret):
        return gbm_tree_update_ref(
            xbt, cum1h, y, f, w, n_splits=n_splits, nb=nb,
            min_leaf=min_leaf, lr=lr, emit_tree=emit_tree,
        )
    # Mosaic: block sublane dim must be a multiple of 8 (or the array dim)
    cb = -(-min(chain_block, c_total, max(cb_fit, 8)) // 8) * 8
    c_pad = -(-c_total // cb) * cb - c_total
    if c_pad:
        pad = lambda a: jnp.pad(a, ((0, c_pad), (0, 0)))
        y, f, w = pad(y), pad(f), pad(w)
    kern = functools.partial(
        _tree_kernel, n_splits=n_splits, nb=nb, p=p,
        min_leaf=float(min_leaf), lr=float(lr),
    )
    c_all = c_total + c_pad
    chain_spec = pl.BlockSpec((cb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    node_spec = pl.BlockSpec(
        (cb, n_total), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_specs = [chain_spec]
    out_shape = [jax.ShapeDtypeStruct((c_all, n), jnp.float32)]
    if emit_tree:
        for dt in (jnp.int32, jnp.int32, jnp.float32, jnp.int32, jnp.int32,
                   jnp.float32):
            out_specs.append(node_spec)
            out_shape.append(jax.ShapeDtypeStruct((c_all, n_total), dt))
        out_specs.append(
            pl.BlockSpec((cb, p), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((c_all, p), jnp.float32))
    out = pl.pallas_call(
        kern,
        grid=(c_all // cb,),
        in_specs=[
            pl.BlockSpec((p, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                cum1h.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            chain_spec,
            chain_spec,
            chain_spec,
        ],
        out_specs=out_specs if emit_tree else out_specs[0],
        out_shape=out_shape if emit_tree else out_shape[0],
        interpret=interpret,
    )(xbt.astype(jnp.float32), cum1h, y, f, w)
    if emit_tree:
        return tuple(o[:c_total] for o in out)
    return out[:c_total]


def gbm_tree_update_ref(
    xbt, cum1h, y, f, w, *, n_splits: int, nb: int, min_leaf: float, lr: float,
    emit_tree: bool = False,
):
    """jnp twin of the fused kernel (CPU fallback / equivalence oracle)."""
    from ..models.trees import grow_bestfirst_trees_cumshared

    out = grow_bestfirst_trees_cumshared(
        xbt.T.astype(jnp.int32), y - f, w,
        n_splits=n_splits, min_leaf=min_leaf, bin_cum1h=cum1h,
        return_tree=emit_tree,
    )
    if emit_tree:
        value, cur, tree = out
    else:
        value, cur = out
    n_total = 2 * n_splits + 1
    pred = jnp.zeros_like(f)
    for t in range(n_total):                 # value[cur] without a gather
        pred = jnp.where(cur == t, value[:, t : t + 1], pred)
    f_new = f + lr * pred
    if emit_tree:
        # kernel output order: feat, thr_bin, internal, left, right, value,
        # var_gain
        return (f_new,) + tree[:5] + (value, tree[5])
    return f_new
