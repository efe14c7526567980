"""RF fit cost at the production CV shape — where do letter r's seconds go?

Letter r is the top CV letter after the round-5 gbm kernel (9.5 s of the
~22 s cv phase).  This sweeps tree_chunk (the vmapped tree-batch width) and
times one fold's 500-tree forest, plus a per-level attribution at the
default chunk.  The suspected bound: `_node_histograms` materialises a
(trees, n, nodes) one-hot — 416 MB f32 at level 8 for a 50-tree chunk —
so deep levels should dominate and wider chunks should hurt.

Run on the TPU: python benchmarks/rf_fit_bench.py
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
    from machisplin_tpu.models import rf
    from machisplin_tpu.models.trees import (
        _best_splits_cum, _node_histograms, bin_data, flat_bin_cum_onehot,
        make_bins,
    )

    rng = np.random.default_rng(0)
    n, p = 813, 5
    x = jnp.asarray(rng.uniform(0, 1, (n, p)), jnp.float32)
    y = jnp.asarray(
        2 * np.asarray(x[:, 0]) + rng.standard_normal(n) * 0.3, jnp.float32
    )
    w = jnp.asarray(rng.uniform(size=n) < 0.9, jnp.float32)

    results = {}
    for chunk in (25, 50, 125, 250):
        f = jax.jit(
            lambda k: rf.fit(
                k, x, y, sample_weight=w, ntree=500, tree_chunk=chunk
            ).trees.value.sum()
        )
        float(f(jax.random.PRNGKey(0)))                      # warm
        best = np.inf
        for r in range(3):
            t0 = time.perf_counter()
            float(f(jax.random.PRNGKey(0)))
            best = min(best, time.perf_counter() - t0)
        results[f"fit500_chunk{chunk}_s"] = best
        print(f"fit500_chunk{chunk}_s", round(best, 3), flush=True)

    # per-level slope attribution at chunk 50: histogram+score one level
    nb = 64
    edges = make_bins(x, nb)
    xb = bin_data(x, edges)
    c1h = flat_bin_cum_onehot(xb, nb)
    wy = w * y
    for level in (4, 6, 8):
        n_nodes = 2**level
        cur = jnp.asarray(
            rng.integers(0, n_nodes, size=(50, n)), jnp.int32
        )

        def one_level(carry, cur=cur, n_nodes=n_nodes):
            def per_tree(c):
                hw, hwy = _node_histograms(c, n_nodes, c1h, nb, w, wy)
                g, bf, bb = _best_splits_cum(
                    hw, hwy, hw[:, :1, -1:], hwy[:, :1, -1:], 5.0
                )
                return g.sum()

            return carry + jax.vmap(per_tree)(cur).sum()

        T_LO, T_HI = 1, 6

        def run(T):
            f = jax.jit(lambda c0: jax.lax.scan(
                lambda cc, _: (one_level(cc), 0.0), c0, None, length=T)[0])
            float(f(jnp.float32(0)))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(jnp.float32(0)))
                best = min(best, time.perf_counter() - t0)
            return best

        ms = (run(T_HI) - run(T_LO)) / (T_HI - T_LO) * 1e3
        results[f"level{level}_hist_score_ms"] = ms
        print(f"level{level}_hist_score_ms", round(ms, 3), flush=True)

    results["backend"] = jax.default_backend()
    art = os.path.join(os.path.dirname(__file__), "..", "artifacts", "round5")
    os.makedirs(art, exist_ok=True)
    with open(os.path.join(art, "RF_FIT_BENCH.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
