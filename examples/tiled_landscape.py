"""README Example 2 equivalent: the large-landscape tiled workflow.

Mirrors the reference's tiles.create -> mltps per tile -> tiles.merge recipe
(reference README.md:157-215, V73:1165-1548) on the bundled 813-station data:
split the covariate stack into out_nrow x out_ncol overlapping tiles, run the
full six-algorithm pipeline independently per tile (embarrassingly parallel —
on a pod, give each tile's mltps its own mesh slice), then feather-blend the
per-tile finals into the full extent.

Run (CPU, a few minutes):
  MACHISPLIN_TEST_REEXEC=1 JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
    python examples/tiled_landscape.py --downsample 24 --fast
Run (TPU, full grid): python examples/tiled_landscape.py --downsample 1
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import machisplin_tpu as mt
from machisplin_tpu.data import load_sampling, synthetic_covariates
from machisplin_tpu.ensemble import CVConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--downsample", type=int, default=24)
    ap.add_argument("--ncol", type=int, default=2)
    ap.add_argument("--nrow", type=int, default=2)
    ap.add_argument("--feather-d", type=int, default=50)
    ap.add_argument("--fast", action="store_true", help="shrunken CV settings")
    ap.add_argument("--out", default=".")
    args = ap.parse_args()

    import jax

    dat = load_sampling()
    stack = synthetic_covariates(args.downsample)
    cfg = mt.MLTPSConfig()
    if args.fast:
        cfg = mt.MLTPSConfig(
            cv=CVConfig(
                n_folds=4,
                brt=dict(tree_complexity=4, learning_rate=0.1, step_size=20, max_trees=150),
                rf=dict(ntree=25, tree_chunk=25),
                nn=dict(hidden=8, maxit=150),
                svm=dict(epochs=80),
            ),
            final_brt=dict(tree_complexity=4, learning_rate=0.05, step_size=20, max_trees=300),
            final_rf=dict(ntree=25, tree_chunk=25),
            final_nn=dict(hidden=8, maxit=150),
            svm_importance_sample=40,
        )

    # 1. tiles.create equivalent (V73:1165-1256; Mydata global bug fixed)
    tiles = mt.tiles_create(
        stack, dat, out_ncol=args.ncol, out_nrow=args.nrow, feather_d=args.feather_d
    )
    print(f"{len(tiles.rast)} tiles; stations per tile:", [len(d) for d in tiles.dat])

    # 2. tiles.id equivalent — tile-ordering figure (V73:1289-1292)
    fig_path = os.path.join(args.out, "tile_ids.png")
    mt.tiles_id(tiles, save_path=fig_path)
    print("wrote:", fig_path)

    # 3. full pipeline per tile (independent => parallelisable across pods)
    finals = []
    for i, (rt, dt) in enumerate(zip(tiles.rast, tiles.dat)):
        t0 = time.time()
        out = mt.mltps(dt, rt, tps=True, config=cfg, key=jax.random.PRNGKey(10 + i))
        finals.append(out[0].final)
        s = out[0].summary
        print(f"tile {i+1}: kept {s['best model(s):']} "
              f"r2 ensemble {s['r2 ensemble:']:.4f} "
              f"r2 final {s.get('r2 final:', float('nan')):.4f} "
              f"({time.time()-t0:.1f}s)")

    # 4. tiles.merge equivalent — feathered mosaic to the full extent
    merged = mt.tiles_merge(
        finals, stack.grid, in_ncol=args.ncol, in_nrow=args.nrow
    )
    print("merged surface:", merged.data.shape,
          "finite fraction %.3f" % float(np.isfinite(np.asarray(merged.data)).mean()))


if __name__ == "__main__":
    main()
