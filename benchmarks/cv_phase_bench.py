"""Micro-benchmark of the gbm.step CV phase — the pipeline's dominant cost.

Times `gbm_step.fit_outer_batched` on the bundled 813-station workload at the
production shape (2 responses x 10 outer folds = 20 chains, each with 10
inner folds => 200 boosting chains), exactly what mltps part 1 runs
(V73:225-319, HOT LOOP #1).  Prints the wall plus the per-split-dispatch
cost so kernel-level changes are attributable.

Run on the TPU:   python benchmarks/cv_phase_bench.py
On CPU (quick):   MACHISPLIN_TEST_REEXEC=1 JAX_PLATFORMS=cpu \
                  PALLAS_AXON_POOL_IPS= python benchmarks/cv_phase_bench.py --small
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    small = "--small" in sys.argv
    import jax
    import jax.numpy as jnp

    from machisplin_tpu.data import load_sampling, synthetic_covariates
    from machisplin_tpu.ensemble.kfold import fold_masks, kfold
    from machisplin_tpu.grid import extract, lonlat_rasters, stack
    from machisplin_tpu.models import gbm_step
    from machisplin_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    dat = load_sampling()
    covars = synthetic_covariates(downsample=24)
    rast_stack = stack([covars, lonlat_rasters(covars.grid, covars.data.dtype)])
    vals = np.asarray(extract(rast_stack, dat["long"], dat["lat"]))
    keep = np.all(np.isfinite(vals), axis=1)
    x = jnp.asarray(vals[keep], jnp.float32)
    ys = np.stack([dat["bio_1"][keep], dat["bio_12"][keep]], axis=1)
    n = x.shape[0]

    k = 4 if small else 10
    cfg = (
        dict(tree_complexity=3, learning_rate=0.1, step_size=20, max_trees=100,
             n_folds=4)
        if small
        else dict(tree_complexity=25, learning_rate=0.01, step_size=50,
                  max_trees=10000, n_folds=10)
    )
    key = jax.random.PRNGKey(0)
    masks, flat_y = [], []
    for r in range(2):
        folds = kfold(jax.random.fold_in(key, r), n, k)
        tr, _ = fold_masks(folds, k)
        masks.append(np.asarray(tr))
        flat_y.append(np.broadcast_to(ys[:, r][None, :], (k, n)))
    w = jnp.asarray(np.concatenate(masks), jnp.float32)       # (2k, n)
    yy = jnp.asarray(np.concatenate(flat_y), jnp.float32)     # (2k, n)

    t0 = time.time()
    preds, best_trees = gbm_step.fit_outer_batched(jax.random.PRNGKey(3), x, yy, w, **cfg)
    wall = time.time() - t0
    # attribute: total split dispatches = sum over chunks of
    # cycles_run x step_size x n_splits (approximated by the deepest chain)
    cycles = int(np.max(best_trees)) // cfg["step_size"]
    total_splits = cycles * cfg["step_size"] * cfg["tree_complexity"]
    out = {
        "metric": "gbm_step_cv_wall",
        "value": round(wall, 2),
        "unit": "s",
        "chains": int(w.shape[0]) * cfg["n_folds"],
        "best_trees": [int(b) for b in best_trees],
        "max_cycles": cycles,
        "approx_ms_per_split_step": round(1000.0 * wall / max(total_splits, 1), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
