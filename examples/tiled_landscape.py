"""README Example 3 equivalent: split a large landscape into tiles, run the
pipeline per tile, feather-merge the results (README.md:157-215:
tiles.create -> mltps x T -> tiles.id -> tiles.merge)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import machisplin_tpu as mt
from machisplin_tpu.data import load_sampling, synthetic_covariates
from machisplin_tpu.ensemble import CVConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--downsample", type=int, default=16)
    ap.add_argument("--ncol", type=int, default=2)
    ap.add_argument("--nrow", type=int, default=2)
    ap.add_argument("--feather", type=int, default=20)
    args = ap.parse_args()

    dat = load_sampling()
    stack = synthetic_covariates(args.downsample)
    tiles = mt.tiles_create(stack, dat, out_ncol=args.ncol, out_nrow=args.nrow,
                            feather_d=args.feather)
    from machisplin_tpu.pipeline import tiles_id
    for info in tiles_id(tiles):
        print(f"tile {info['id']}: center {info['center']}, {len(tiles.dat[info['id']-1])} stations")

    cfg = mt.MLTPSConfig(
        cv=CVConfig(
            n_folds=5,
            brt=dict(tree_complexity=5, learning_rate=0.05, step_size=25, max_trees=300),
            rf=dict(ntree=60, tree_chunk=20),
            nn=dict(hidden=10, maxit=150),
        ),
        final_brt=dict(tree_complexity=5, learning_rate=0.05, step_size=25, max_trees=300),
        final_rf=dict(ntree=60, tree_chunk=20),
        final_nn=dict(hidden=10, maxit=150),
    )
    finals = []
    for i, (d, r) in enumerate(zip(tiles.dat, tiles.rast)):
        t0 = time.time()
        out = mt.mltps(d, r, tps=True, config=cfg)
        print(f"tile {i + 1}: {out[0].summary} ({time.time() - t0:.0f}s)")
        finals.append(out[0].final)

    merged = mt.tiles_merge(finals, stack.grid, in_ncol=args.ncol, in_nrow=args.nrow)
    mt.write_geotiff([type("R", (), {
        "name": "bio_1_merged", "final": merged,
        "summary": {"layer": "bio_1_merged"}, "n_layers": 1,
    })()], ".")
    print("merged surface:", merged)


if __name__ == "__main__":
    main()
