"""Forest bin-interval kernel sweep: membership dtype x block sizes.

Round-4 (VERDICT next #6): the forest raster kernel measured 19.6 Mcells/s
(config_forest) vs ~300 for the TPS kernel; target >= 40.  The roofline says
the one-hot bin-matmul MXU reformulation LOSES at these shapes (K = p x 128
lanes => ~1e15 MXU flops at the bench shape, several seconds at peak — worse
than the measured kernel), so the levers swept here are:

  * membership dtype: bf16 masks/bounds/bins (exact — integers <= 256,
    0/1 masks; value matvec stays f32) halve the dominant (leaves, cells)
    VMEM traffic;
  * cell_block / leaf_chunk tiling.

Run on the real TPU (default env): python benchmarks/forest_kernel_sweep.py
Writes benchmarks/forest_kernel_sweep.json.  Timing: slope (k=1 vs k=5, one
readback) with best-of-3, per CLAUDE.md tunnel-noise rules.
"""
from __future__ import annotations

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(m_cells: int = 2_097_152, n_trees: int = 2000, n_splits: int = 3):
    import jax
    import jax.numpy as jnp

    from machisplin_tpu.models import brt
    from machisplin_tpu.ops.pallas_forest import build_leaf_bins, forest_predict_bins
    from machisplin_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    n, p = 2000, 5
    x = rng.standard_normal((n, p)).astype(np.float32)
    y = (np.sin(x[:, 0]) + 0.5 * x[:, 1] * x[:, 2]
         + 0.1 * rng.standard_normal(n)).astype(np.float32)
    state = brt.fit(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y),
        n_trees=n_trees, n_splits=n_splits, lr=0.05,
    )
    w = state.tree_active * state.lr
    xq = jnp.asarray(rng.standard_normal((m_cells, p)).astype(np.float32))
    tabs = build_leaf_bins(state.trees, n_feat=p)
    n_leaves = int((tabs.leaf_tree >= 0).sum())
    print(f"{n_leaves} leaves, {tabs.n_bins} bins", flush=True)

    def slope_time(fn):
        s0 = float(jnp.nansum(fn()))  # compile + settle

        def run_k(k):
            s = None
            for _ in range(k):
                t = jnp.nansum(fn())
                s = t if s is None else s + t
            return float(s)

        best = np.inf
        for _ in range(3):
            t0 = time.time(); run_k(1); d1 = time.time() - t0
            t0 = time.time(); run_k(5); d5 = time.time() - t0
            best = min(best, max((d5 - d1) / 4, 1e-9))
        return best, s0

    results = []
    ref_sum = None
    for mdt, cb, lc in itertools.product(
        ["float32", "bfloat16"], [2048, 4096, 8192], [512, 1024, 2048]
    ):
        try:
            dt, chk = slope_time(lambda: forest_predict_bins(
                state.trees, xq, w, tables=tabs,
                membership_dtype=mdt, cell_block=cb, leaf_chunk=lc,
            ))
        except Exception as e:  # a tiling Mosaic rejects: record and move on
            print(f"{mdt} cb={cb} lc={lc}: FAILED {type(e).__name__}", flush=True)
            results.append(dict(mdtype=mdt, cell_block=cb, leaf_chunk=lc,
                                error=str(e)[:200]))
            continue
        if ref_sum is None:
            ref_sum = chk
        rate = m_cells / dt / 1e6
        ok = abs(chk - ref_sum) <= 1e-3 * max(abs(ref_sum), 1.0)
        print(f"{mdt} cb={cb} lc={lc}: {rate:.1f} Mcells/s "
              f"({dt*1e3:.1f} ms/call, checksum {'ok' if ok else 'DRIFT'})",
              flush=True)
        results.append(dict(mdtype=mdt, cell_block=cb, leaf_chunk=lc,
                            mcells_per_s=round(rate, 1), checksum_ok=ok))
    out = dict(
        m_cells=m_cells, n_trees=n_trees, n_leaves=n_leaves,
        n_bins=tabs.n_bins, p=p, results=results,
    )
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "forest_kernel_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
