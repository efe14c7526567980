"""README Example 1 equivalent: downscale the bundled 813-station climate
table over the alt/slope/TWI covariate grid.

The reference runs machisplin.mltps on sampling.csv + the bundled ~90 m
rasters (README.md:67-154).  The real GeoTIFF payloads are stripped from the
mounted reference, so this example uses the synthetic covariate stack on the
exact bundled grid geometry.  Run time scales with --downsample (default 16
-> ~155x204 cells; use 1 for the full 8.08M-cell grid on TPU).
"""
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
    ap.add_argument("--tps", action=argparse.BooleanOptionalAction, default=True)
    ap.add_argument("--out", default=".")
    ap.add_argument("--fast", action="store_true", help="shrunken CV settings")
    args = ap.parse_args()

    dat = load_sampling()
    stack = synthetic_covariates(args.downsample)
    cfg = mt.MLTPSConfig()
    if args.fast:
        cfg = mt.MLTPSConfig(
            cv=CVConfig(
                n_folds=5,
                brt=dict(tree_complexity=5, learning_rate=0.05, step_size=25, max_trees=500),
                rf=dict(ntree=100, tree_chunk=25),
                nn=dict(hidden=10, maxit=200),
            ),
            final_brt=dict(tree_complexity=5, learning_rate=0.01, step_size=25, max_trees=1000),
            final_rf=dict(ntree=100, tree_chunk=25),
            final_nn=dict(hidden=10, maxit=200),
        )

    from machisplin_tpu.utils import PhaseTimer

    timer = PhaseTimer()
    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    results = mt.mltps(
        dat, stack, tps=args.tps, config=cfg, timer=timer,
        log_file=os.path.join(args.out, "MachiSplin.LOG.txt"),
    )
    wall = time.time() - t0
    print(f"pipeline finished in {wall:.1f}s")
    for r in results:
        print(r.summary)
    paths = mt.write_geotiff(results, args.out)
    mt.write_residuals(results, args.out)
    mt.write_loadings(results, args.out)
    print("wrote:", paths)
    with open(os.path.join(args.out, "TIMING.txt"), "w") as f:
        ncell = stack.grid.ncell / 1e6
        f.write(f"wall: {wall:.1f}s ({len(results)} responses, "
                f"{ncell:.2f}M-cell grid, backend {_backend()})\n\n")
        f.write(timer.report() + "\n\n")
        for r in results:
            f.write(repr({"layer": r.name, **r.summary}) + "\n")
    print("wrote:", os.path.join(args.out, "TIMING.txt"))


def _backend():
    import jax

    return f"{jax.default_backend()} x{jax.device_count()}"


if __name__ == "__main__":
    main()
