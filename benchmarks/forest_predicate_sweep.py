"""Forest kernel phase-2 sweep: the predicated feature loop (round 4).

Phase 1 (forest_kernel_sweep.py) measured dtype x tiling: best 28.9 Mcells/s
at f32 cb=8192 lc=1024 (bf16 lost — compares must run f32 on v5e, and the
upcasts cost more than the halved traffic saved).  Phase 2 A/Bs the
feature-set-sorted + chunk-predicated kernel (ops/pallas_forest.py
``predicate=True``): leaves of depth-d trees constrain <= d of the p
features, so sorting leaf slots by constrained-feature set lets whole
(leaf-chunk x cell-block) compare tiles skip via lax.cond.  At this bench
shape (4-leaf trees, p=5) the expected op-count ratio is ~5/3.

Also validates that Mosaic actually compiles lax.cond-with-carry on v5e —
if it rejects, ops/pallas_forest._PREDICATE_DEFAULT stays False.

Run on the real TPU (default env): python benchmarks/forest_predicate_sweep.py
Writes benchmarks/forest_predicate_sweep.json.  Timing: slope (k=1 vs k=5,
one readback), best-of-3, per CLAUDE.md tunnel-noise rules.
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
    tabs_full = build_leaf_bins(state.trees, n_feat=p, drop_leaf=False)
    tabs_drop = build_leaf_bins(state.trees, n_feat=p, drop_leaf=True)
    for name, tabs in (("full", tabs_full), ("drop", tabs_drop)):
        n_leaves = int((tabs.leaf_tree >= 0).sum())
        cons = (tabs.lo[:p] > 0) | (tabs.hi[:p] < tabs.n_bins - 1)
        act512 = cons.reshape(p, -1, 512).any(axis=2)
        print(f"{name}: {n_leaves} leaves, {tabs.n_bins} bins, "
              f"mean active features/chunk(512): "
              f"{act512.sum(0).mean():.2f} of {p}", flush=True)

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
    # mode: "base" (phase-1 winner), "pred" (lax.cond — measured 5x slower,
    # kept one point for the record), "seg" (static-segment variant)
    # (mode, cell_block, leaf_chunk, max_segments) — phase 3b re-times the
    # top combos on the boolean-accumulation kernel (4 VPU ops/feature tile
    # vs 5) and sweeps the segment-count budget: more segments = tighter
    # per-run feature unions but more pallas_call launches.
    # phase 3d: the drop-leaf tables (one leaf per tree folded into a
    # constant — 25% fewer slots for 4-leaf trees) x the segment variant.
    # History: 3b boolean i1 accumulation was 20-40% SLOWER
    # (forest_predicate_sweep_phase3b.json); 3c min-slack arithmetic tied
    # the compare/multiply form (best 32.7 at seg/512/ms24); cb=16384
    # compiled but lost ~10%; the lax.cond predicate runs at 6 Mcells/s.
    combos = [
        ("full-base", 8192, 1024, 12),   # phase-1 winner = the baseline
        ("full-seg", 8192, 512, 24),     # 3c winner on full tables
        ("drop-base", 8192, 1024, 12),
        ("drop-seg", 8192, 512, 24),
        ("drop-seg", 8192, 512, 12),
        ("drop-seg", 8192, 256, 24),
    ]
    for mode, cb, lc, ms in combos:
        drop, variant = mode.split("-")
        kw = dict(predicate=(variant == "pred"), segments=(variant == "seg"),
                  max_segments=ms)
        tabs = tabs_drop if drop == "drop" else tabs_full
        try:
            dt, chk = slope_time(lambda: forest_predict_bins(
                state.trees, xq, w, tables=tabs,
                cell_block=cb, leaf_chunk=lc, **kw,
            ))
        except Exception as e:  # Mosaic rejection: record and move on
            print(f"{mode} cb={cb} lc={lc} ms={ms}: FAILED {type(e).__name__}: "
                  f"{str(e)[:150]}", flush=True)
            results.append(dict(mode=mode, cell_block=cb, leaf_chunk=lc,
                                max_segments=ms, error=str(e)[:300]))
            continue
        if ref_sum is None:
            ref_sum = chk
        rate = m_cells / dt / 1e6
        ok = abs(chk - ref_sum) <= 1e-3 * max(abs(ref_sum), 1.0)
        print(f"{mode} cb={cb} lc={lc} ms={ms}: {rate:.1f} Mcells/s "
              f"({dt*1e3:.1f} ms/call, checksum {'ok' if ok else 'DRIFT'})",
              flush=True)
        results.append(dict(mode=mode, cell_block=cb, leaf_chunk=lc,
                            max_segments=ms,
                            mcells_per_s=round(rate, 1), checksum_ok=ok))
    out = dict(
        m_cells=m_cells, n_trees=n_trees, n_leaves=n_leaves,
        n_bins=tabs.n_bins, p=p,
        mean_active_features_per_chunk512=round(float(act512.sum(0).mean()), 2),
        results=results,
    )
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "forest_predicate_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
