"""BASELINE configs 4-5: tiled downscale at raster scales beyond HBM.

Config 4 shape: ~50k stations over ~1e8 cells using the tiled TPS path with
streamed prediction.  Config 5 shape: 500k knots via the Nystrom low-rank
spline.  The grid surface streams tile-by-tile through the Pallas kernel —
HBM never holds more than one tile block plus the knot tables.

Defaults are sized for a quick single-chip demonstration; pass --cells 1e8
--stations 50000 for the full config-4 run (v5e-8 recommended; a single v5e
chip sustains ~80 Mcells/s on the predict kernel, so 1e8 cells is ~2-3
minutes of kernel time plus solve).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import math
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stations", type=int, default=50000)
    ap.add_argument("--cells", type=float, default=2e7)
    ap.add_argument("--landmarks", type=int, default=2048)
    ap.add_argument("--tile-px", type=int, default=1500)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from machisplin_tpu.grid import GridSpec
    from machisplin_tpu.ops.nystrom import nystrom_tps_fit
    from machisplin_tpu.ops.tps import tps_predict_grid

    side = int(math.sqrt(args.cells))
    grid = GridSpec(nrows=side, ncols=side, xmin=0.0, ymax=1.0, dx=1 / side, dy=1 / side)
    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 1, (args.stations, 2)).astype(np.float32)
    y = (
        np.sin(6 * coords[:, 0]) * np.cos(5 * coords[:, 1])
        + 0.1 * rng.standard_normal(args.stations)
    ).astype(np.float32)

    t0 = time.perf_counter()
    model = nystrom_tps_fit(
        jnp.asarray(coords), jnp.asarray(y), m=args.landmarks,
        key=jax.random.PRNGKey(0), chunk=16384,
    )
    lam = float(model.lam)  # force
    t_solve = time.perf_counter() - t0
    print(f"Nystrom solve: {args.stations} stations -> {args.landmarks} landmarks "
          f"in {t_solve:.2f}s (lambda {lam:.3g})")

    # stream prediction in row panels (each panel goes through the Pallas kernel)
    panel = max(args.tile_px, 256)
    t0 = time.perf_counter()
    total = 0
    checksum = 0.0
    for r0 in range(0, grid.nrows, panel):
        sub = grid.subgrid(r0, min(r0 + panel, grid.nrows), 0, grid.ncols)
        surf = tps_predict_grid(model, sub)
        checksum += float(jnp.sum(surf))        # readback forces completion
        total += sub.ncell
    dt = time.perf_counter() - t0
    print(
        f"streamed predict: {total / 1e6:.1f} Mcells in {dt:.1f}s "
        f"-> {total / dt / 1e6:.1f} Mcells/s (checksum {checksum:.4g})"
    )
    print(f"end-to-end: {(t_solve + dt):.1f}s")


if __name__ == "__main__":
    main()
