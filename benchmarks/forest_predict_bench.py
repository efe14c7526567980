"""Forest raster-prediction throughput: bin-interval kernel vs path-matrix.

The round-1 path-matrix MXU algebra (models/trees.bestfirst_forest_predict_mxu)
is HBM-bound on its (cells, trees, nodes) intermediates (~1.4 s / 836k cells /
2000 trees measured).  The bin-interval kernel (ops/pallas_forest) keeps the
membership mask in VMEM — this script measures both on the same forest.

Run on the real TPU (default env):  python benchmarks/forest_predict_bench.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(m_cells: int = 836_000, n_trees: int = 2000, n_splits: int = 3):
    import jax
    import jax.numpy as jnp

    from machisplin_tpu.models import brt
    from machisplin_tpu.models.trees import bestfirst_forest_predict_mxu
    from machisplin_tpu.ops.pallas_forest import build_leaf_bins, forest_predict_bins
    from machisplin_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    n, p = 2000, 5
    x = rng.standard_normal((n, p)).astype(np.float32)
    y = (np.sin(x[:, 0]) + 0.5 * x[:, 1] * x[:, 2] + 0.1 * rng.standard_normal(n)).astype(np.float32)
    state = brt.fit(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y),
        n_trees=n_trees, n_splits=n_splits, lr=0.05,
    )
    w = state.tree_active * state.lr
    xq = rng.standard_normal((m_cells, p)).astype(np.float32)
    xq_d = jnp.asarray(xq)
    float(jnp.nansum(state.trees.thr))  # force training before timing the walk

    t0 = time.time()
    tabs = build_leaf_bins(state.trees, n_feat=p)
    print(f"table walk: {time.time()-t0:.2f}s  "
          f"({int((tabs.leaf_tree>=0).sum())} leaves, {tabs.n_bins} bins)", flush=True)

    def timed(label, fn):
        out = fn()
        s0 = float(jnp.nansum(out))  # compile + settle

        def run_k(k):
            # async applications, ONE readback: slope cancels the axon
            # tunnel's fixed per-readback latency
            s = None
            for _ in range(k):
                t = jnp.nansum(fn())
                s = t if s is None else s + t
            return float(s)

        t0 = time.time()
        run_k(1)
        dt1 = time.time() - t0
        t0 = time.time()
        run_k(5)
        dt5 = time.time() - t0
        dt = max((dt5 - dt1) / 4, 1e-9)
        print(f"{label}: {dt:.4f}s/call -> {m_cells/dt/1e6:.1f} Mcells/s "
              f"(single-shot incl. readback {dt1:.3f}s, checksum {s0:.5g})", flush=True)
        return out

    a = timed("bin-interval kernel", lambda: forest_predict_bins(state.trees, xq_d, w, tables=tabs))
    b = timed("path-matrix (round1)", lambda: bestfirst_forest_predict_mxu(state.trees, xq_d, w))
    err = float(jnp.max(jnp.abs(a - b)))
    # serial check on a slice
    from machisplin_tpu.models.trees import forest_predict

    ref = forest_predict(state.trees, xq_d[:4096], n_splits, weights=w)
    err_ref = float(jnp.max(jnp.abs(a[:4096] - ref)))
    print(f"max |bins - path_matrix| = {err:.3g};  max |bins - serial[:4096]| = {err_ref:.3g}")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
