"""Where does the gbm split step's ~0.24 ms go?  On-chip ablation.

Round-5 finding: sharing the one-hot across inner folds (shared_bins) cut
per-step HBM traffic ~10x but moved the letter-b wall NOT AT ALL (15.1 ->
14.5/15.4 s) — so the step is latency/op-count bound, not bandwidth bound.
This bench SLOPE-times stripped variants of the tree-growth step (lax.scan
the variant T times inside one jit; difference two T values to cancel the
~28 ms tunnel dispatch+readback RTT that swamps single-shot timings).

Run on the TPU: python benchmarks/split_step_ablation.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from machisplin_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from machisplin_tpu.models.trees import (
        _best_splits, _hist_matmul, flat_bin_onehot, bin_data, make_bins_masked,
        grow_bestfirst_trees_shared, assigned_predict_batched,
    )

    rng = np.random.default_rng(0)
    n, p, nb = 813, 5, 64
    F, K = 20, 10                      # production CV shape (2 resp x 10 outer)
    n_splits = 25
    x = jnp.asarray(rng.uniform(0, 1, (n, p)), jnp.float32)
    w_outer = jnp.asarray(rng.uniform(size=(F, n)) < 0.9, jnp.float32)
    edges = jax.vmap(lambda wf: make_bins_masked(x, wf, nb))(w_outer)
    xb = jax.vmap(lambda e: bin_data(x, e))(edges)           # (F, n, p)
    b1h = jax.vmap(lambda q: flat_bin_onehot(q, nb))(xb)     # (F, n, p*nb)
    ys = jnp.asarray(rng.standard_normal((F, K, n)), jnp.float32)
    ws = jnp.asarray(rng.uniform(size=(F, K, n)) < 0.45, jnp.float32)

    T_LO, T_HI = 2, 22

    def slope(body, carry0, reps=3):
        """Per-iteration seconds of `carry = body(carry)` via scan-length slope."""

        def run(T):
            f = jax.jit(lambda c: jax.lax.scan(
                lambda cc, _: (body(cc), 0.0), c, None, length=T)[0])
            out = f(carry0)
            jax.tree.map(lambda a: float(jnp.nansum(a)), out)  # warm + force
            best = np.inf
            for _ in range(reps):
                t0 = time.perf_counter()
                out = f(carry0)
                jax.tree.map(lambda a: float(jnp.nansum(a)), out)
                best = min(best, time.perf_counter() - t0)
            return best

        return (run(T_HI) - run(T_LO)) / (T_HI - T_LO)

    results = {}

    # A. full shared-bins tree grower (one boosting tree for all F*K chains)
    def full_tree(fm):
        def per_outer(f_f, y_f, w_f, xb_f, b1h_f):
            value, cur = grow_bestfirst_trees_shared(
                xb_f, y_f - f_f, w_f, n_splits=n_splits, min_leaf=10.0,
                bin1h=b1h_f,
            )
            return f_f + 0.01 * assigned_predict_batched(
                value, cur, 2 * n_splits + 1
            )

        return jax.vmap(per_outer)(fm, ys, ws, xb, b1h)

    results["full_tree_ms"] = slope(full_tree, jnp.zeros((F, K, n))) * 1e3

    # B. histogram contractions alone: n_splits x (A assembly + hist matmul)
    def hist_only(fm):
        def per_outer(f_f, y_f, w_f, b1h_f):
            wys = w_f * (y_f - f_f)
            m = w_f
            acc = jnp.zeros((4 * K, p * nb), jnp.float32)
            for k in range(n_splits):
                a = jnp.concatenate([m, wys, m, wys], axis=0)
                h = _hist_matmul(a, b1h_f)
                acc = acc + h
                m = m + h[:K, :1] * 1e-12          # dependency chain
            return f_f + acc[:K, :1] * 1e-12

        return jax.vmap(per_outer)(fm, ys, ws, b1h)

    results["hist_only_ms"] = slope(hist_only, jnp.zeros((F, K, n))) * 1e3

    # C. best-splits alone: n_splits x (stacked cumsum + gains + argmax)
    def splits_only(hw):
        def per_outer(h_f):
            h = h_f
            for k in range(n_splits):
                cg, cf, cb = _best_splits(h, h * 0.5, 10.0)
                h = h + (cg + cf + cb)[:, None, None] * 1e-12
            return h

        return jax.vmap(per_outer)(hw)

    hw0 = jnp.asarray(rng.uniform(size=(F, 2 * K, p, nb)), jnp.float32)
    results["splits_only_ms"] = slope(splits_only, hw0) * 1e3

    # D. routing/bookkeeping alone (argmax, masks, where-updates, cur update)
    def route_only(carry):
        cur_all, gain_all = carry

        def per_outer(y_f, w_f, xb_f, cur, node_gain):
            n_total = 2 * n_splits + 1
            xb_t = xb_f.astype(jnp.float32)
            iota_nodes = jnp.arange(n_total)
            p_iota = jnp.arange(p)
            for k in range(n_splits):
                q = jnp.argmax(node_gain, axis=1)
                gq = jnp.max(node_gain, axis=1)
                ok = gq > 1e-9
                qsel = iota_nodes[None, :] == q[:, None]
                bfq = jnp.sum(jnp.where(qsel, k % p, 0), axis=1, dtype=jnp.int32)
                fsel = (bfq[:, None] == p_iota[None, :]).astype(jnp.float32)
                sample_bin = jnp.matmul(fsel, xb_t.T,
                                        precision=jax.lax.Precision.HIGHEST)
                in_parent = ok[:, None] & (cur == q[:, None])
                go_left = in_parent & (sample_bin <= (k % nb))
                cur = jnp.where(
                    in_parent, jnp.where(go_left, 2 * k + 1, 2 * k + 2), cur)
                node_gain = jnp.where(qsel, 0.0, node_gain)
                node_gain = node_gain.at[:, 2 * k + 1].set(gq * 0.99)
                node_gain = node_gain.at[:, 2 * k + 2].set(gq * 0.98)
            return cur, node_gain

        out = jax.vmap(per_outer)(ys, ws, xb, cur_all, gain_all)
        return out

    carry0 = (jnp.zeros((F, K, n), jnp.int32),
              jnp.ones((F, K, 2 * n_splits + 1), jnp.float32))
    results["route_only_ms"] = slope(route_only, carry0) * 1e3

    # E. leaf values + assigned predict alone (once per tree, not per split)
    def leaf_only(fm):
        def per_outer(f_f, w_f, y_f):
            cur_f = jnp.clip(f_f, 0, 2 * n_splits).astype(jnp.int32)
            node1h = (cur_f[:, :, None]
                      == jnp.arange(2 * n_splits + 1)[None, None, :]
                      ).astype(jnp.float32)
            sw = jnp.einsum("knt,kn->kt", node1h, w_f,
                            precision=jax.lax.Precision.HIGHEST)
            swy = jnp.einsum("knt,kn->kt", node1h, w_f * y_f,
                             precision=jax.lax.Precision.HIGHEST)
            value = swy / jnp.maximum(sw, 1e-12)
            return f_f + assigned_predict_batched(value, cur_f, 2 * n_splits + 1)

        return jax.vmap(per_outer)(fm, ws, ys)

    results["leaf_only_ms"] = slope(leaf_only, jnp.zeros((F, K, n))) * 1e3

    # F. full tree at n/8 rows — latency-bound work shouldn't shrink 8x
    n_small = 104
    xs_s = x[:n_small]
    edges_s = jax.vmap(lambda wf: make_bins_masked(xs_s, wf, nb))(
        w_outer[:, :n_small])
    xb_s = jax.vmap(lambda e: bin_data(xs_s, e))(edges_s)
    b1h_s = jax.vmap(lambda q: flat_bin_onehot(q, nb))(xb_s)
    ys_s, ws_s = ys[:, :, :n_small], ws[:, :, :n_small]

    def full_tree_small(fm):
        def per_outer(f_f, y_f, w_f, xb_f, b1h_f):
            value, cur = grow_bestfirst_trees_shared(
                xb_f, y_f - f_f, w_f, n_splits=n_splits, min_leaf=2.0,
                bin1h=b1h_f,
            )
            return f_f + 0.01 * assigned_predict_batched(
                value, cur, 2 * n_splits + 1
            )

        return jax.vmap(per_outer)(fm, ys_s, ws_s, xb_s, b1h_s)

    results["full_tree_smallrows_ms"] = slope(
        full_tree_small, jnp.zeros((F, K, n_small))) * 1e3

    results["per_split_full_us"] = results["full_tree_ms"] / n_splits * 1e3
    results["backend"] = jax.default_backend()
    art = os.path.join(os.path.dirname(__file__), "..", "artifacts", "round5")
    os.makedirs(art, exist_ok=True)
    with open(os.path.join(art, "SPLIT_STEP_ABLATION.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
