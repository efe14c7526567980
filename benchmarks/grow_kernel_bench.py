"""On-chip A/B of the gbm tree-step variants at the production CV shape.

Round-5 sequel to split_step_ablation.py (which pinned 91% of the 3.39
ms/tree on the cumsum+gain+argmax chain's op-launch latency).  Variants:

  shared     round-4 grower: per-outer-fold bins, vmapped over F
  cumshared  cumulative-one-hot jnp formulation (no cumsum), global bins
  pallas     the fused whole-tree kernel (ops/pallas_grow.py), global bins

All slope-timed (scan the step T times in one jit; difference two T
values) to cancel the ~28 ms tunnel RTT.

Run on the TPU: python benchmarks/grow_kernel_bench.py
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
        assigned_predict_batched, bin_data, flat_bin_cum_onehot,
        flat_bin_onehot, grow_bestfirst_trees_cumshared,
        grow_bestfirst_trees_shared, make_bins, make_bins_masked,
    )
    from machisplin_tpu.ops.pallas_grow import gbm_tree_update

    rng = np.random.default_rng(0)
    n, p, nb = 813, 5, 64
    F, K = 20, 10                       # production CV shape
    n_splits = 25
    lr = 0.01
    x = jnp.asarray(rng.uniform(0, 1, (n, p)), jnp.float32)
    w_outer = jnp.asarray(rng.uniform(size=(F, n)) < 0.9, jnp.float32)
    ys = jnp.asarray(rng.standard_normal((F, K, n)), jnp.float32)
    ws = jnp.asarray(rng.uniform(size=(F, K, n)) < 0.45, jnp.float32)

    T_LO, T_HI = 2, 22

    def slope(body, carry0, reps=3):
        def run(T):
            f = jax.jit(lambda c: jax.lax.scan(
                lambda cc, _: (body(cc), 0.0), c, None, length=T)[0])
            out = f(carry0)
            jax.tree.map(lambda a: float(jnp.nansum(a)), out)
            best = np.inf
            for _ in range(reps):
                t0 = time.perf_counter()
                out = f(carry0)
                jax.tree.map(lambda a: float(jnp.nansum(a)), out)
                best = min(best, time.perf_counter() - t0)
            return best

        return (run(T_HI) - run(T_LO)) / (T_HI - T_LO)

    results = {}

    # A. round-4 shared grower (per-outer bins)
    edges_f = jax.vmap(lambda wf: make_bins_masked(x, wf, nb))(w_outer)
    xb_f = jax.vmap(lambda e: bin_data(x, e))(edges_f)
    b1h_f = jax.vmap(lambda q: flat_bin_onehot(q, nb))(xb_f)

    def shared_tree(fm):
        def per_outer(f_f, y_f, w_f, xb_o, b1h_o):
            value, cur = grow_bestfirst_trees_shared(
                xb_o, y_f - f_f, w_f, n_splits=n_splits, min_leaf=10.0,
                bin1h=b1h_o,
            )
            return f_f + lr * assigned_predict_batched(
                value, cur, 2 * n_splits + 1
            )

        return jax.vmap(per_outer)(fm, ys, ws, xb_f, b1h_f)

    results["shared_ms"] = slope(shared_tree, jnp.zeros((F, K, n))) * 1e3
    print("shared_ms", results["shared_ms"], flush=True)

    # B/C. global bins: one table for all F*K chains
    edges_g = make_bins(x, nb)
    xb_g = bin_data(x, edges_g)
    c1h = flat_bin_cum_onehot(xb_g, nb)
    xbt = xb_g.T.astype(jnp.float32)
    y_flat = ys.reshape(F * K, n)
    w_flat = ws.reshape(F * K, n)

    def cum_tree(fm):
        value, cur = grow_bestfirst_trees_cumshared(
            xb_g, y_flat - fm, w_flat, n_splits=n_splits, min_leaf=10.0,
            bin_cum1h=c1h,
        )
        return fm + lr * assigned_predict_batched(value, cur, 2 * n_splits + 1)

    results["cumshared_ms"] = slope(cum_tree, jnp.zeros((F * K, n))) * 1e3
    print("cumshared_ms", results["cumshared_ms"], flush=True)

    for cb in (64, 104, 128):
        def pallas_tree(fm, cb=cb):
            return gbm_tree_update(
                xbt, c1h, y_flat, fm, w_flat,
                n_splits=n_splits, nb=nb, min_leaf=10.0, lr=lr,
                chain_block=cb,
            )

        results[f"pallas_cb{cb}_ms"] = slope(
            pallas_tree, jnp.zeros((F * K, n))) * 1e3
        print(f"pallas_cb{cb}_ms", results[f"pallas_cb{cb}_ms"], flush=True)

    # quality sanity: 60-tree boosting runs — near-tie split flips between
    # the kernel's and XLA's bf16 accumulation orders must NOT move the
    # out-of-fit deviance (both are legitimate argmax winners)
    oof = (w_flat == 0).astype(jnp.float32)
    oof_sum = jnp.maximum(jnp.sum(oof, axis=1), 1.0)

    def boost(step_fn, n_trees=60):
        def body(fm, _):
            return step_fn(fm), None
        fm, _ = jax.jit(
            lambda f0: jax.lax.scan(body, f0, None, length=n_trees)
        )(jnp.zeros((F * K, n)))
        dev = jnp.sum(oof * (y_flat - fm) ** 2, axis=1) / oof_sum
        return float(jnp.mean(dev))

    results["oof_dev_pallas"] = boost(
        lambda fm: gbm_tree_update(
            xbt, c1h, y_flat, fm, w_flat,
            n_splits=n_splits, nb=nb, min_leaf=10.0, lr=0.05,
        )
    )
    results["oof_dev_cumshared"] = boost(
        lambda fm: gbm_tree_update(
            xbt, c1h, y_flat, fm, w_flat,
            n_splits=n_splits, nb=nb, min_leaf=10.0, lr=0.05,
            use_pallas=False,
        )
    )
    results["backend"] = jax.default_backend()
    art = os.path.join(os.path.dirname(__file__), "..", "artifacts", "round5")
    os.makedirs(art, exist_ok=True)
    with open(os.path.join(art, "GROW_KERNEL_BENCH.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
