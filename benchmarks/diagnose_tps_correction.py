"""Diagnose the round-1 TPS-correction regression (VERDICT weak #4).

Round 1's real-TPU run recorded bio_1: r2 ensemble 0.9252 -> r2 final 0.9140,
i.e. the tiled TPS error surface made station R^2 WORSE and the keep rule
discarded it (reference keep rule V73:925-930; the reference's own pitch is
that this correction drives R^2 > 0.99, README.md:55-56).  Because the
correction was discarded, artifacts/round1/bio_1_residuals.csv contains the
RAW ensemble residuals — enough to replay part 3/4 offline and isolate where
the correction loses accuracy.

Run (CPU):
  MACHISPLIN_TEST_REEXEC=1 JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
      python benchmarks/diagnose_tps_correction.py [downsample]

Compares, at the 813 stations:
  A. direct spline evaluation of ONE full-extent TPS fit (no raster);
  B. the n_tiles==1 raster path (fit + grid predict + extract);
  C. the production 6-tile batched path + feathering + extract;
  D. per-tile fits evaluated directly at their own stations (no mosaic);
and prints GCV lambda / eff_df so over-smoothing is visible.
"""
from __future__ import annotations

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax.numpy as jnp

from machisplin_tpu.data import example_grid
from machisplin_tpu.grid import Raster, crop, extract
from machisplin_tpu.ops.tps import tps_fit, tps_predict, tps_predict_grid
from machisplin_tpu.pipeline.mltps import MLTPSConfig, _tps_error_surface, _tps_tiles


def r2_gain(res, corr):
    """Station R^2 of the corrected residuals relative to raw residuals=0."""
    return 1.0 - np.sum((res - corr) ** 2) / np.sum(res**2)


def main(downsample: int = 4):
    csv = os.path.join(os.path.dirname(HERE), "artifacts/round1/bio_1_residuals.csv")
    tab = np.genfromtxt(csv, delimiter=",", skip_header=1)  # index,residuals,long,lat
    res = np.asarray(tab[:, 1], np.float64)
    coords = np.asarray(tab[:, 2:4], np.float64)

    g = example_grid(downsample)
    cfg = MLTPSConfig(tps_tile_px=1500 // downsample, use_pallas=False)
    n_rx, n_cx, fit_exts, _ = _tps_tiles(g, cfg)
    print(f"grid {g.nrows}x{g.ncols}, tiles {n_rx}x{n_cx}")

    # A. one full-extent fit, evaluated directly at the stations
    model = tps_fit(jnp.asarray(coords), jnp.asarray(res))
    at_pts = np.asarray(tps_predict(model, jnp.asarray(coords)))
    print(
        f"A single fit @points : r2 gain {r2_gain(res, at_pts):+.4f}  "
        f"lam {float(model.lam):.3e}  eff_df {float(model.eff_df):.1f}"
    )

    # B. single-tile raster path (grid predict + nearest-cell extract)
    surf = Raster(tps_predict_grid(model, g, use_pallas=False), g)
    at_cells = np.asarray(extract(surf, coords[:, 0], coords[:, 1]))
    print(f"B single fit @cells  : r2 gain {r2_gain(res, at_cells):+.4f}")

    # C. the production tiled + feathered path
    stack = Raster(jnp.ones((1, g.nrows, g.ncols), jnp.float32), g, ("dummy",))
    tiled, n_tiles = _tps_error_surface(coords, res, stack, cfg)
    at_tiled = np.asarray(extract(tiled, coords[:, 0], coords[:, 1]))
    print(f"C tiled path @cells  : r2 gain {r2_gain(res, at_tiled):+.4f}  ({n_tiles} tiles)")

    # D. per-tile fits evaluated directly at their own stations
    for h, ext in enumerate(fit_exts):
        sel = (
            (coords[:, 0] >= ext[0]) & (coords[:, 0] <= ext[1])
            & (coords[:, 1] >= ext[2]) & (coords[:, 1] <= ext[3])
        )
        if sel.sum() < cfg.min_tile_points:
            print(f"D tile {h}: {int(sel.sum())} pts (skipped)")
            continue
        m = tps_fit(jnp.asarray(coords[sel]), jnp.asarray(res[sel]))
        p = np.asarray(tps_predict(m, jnp.asarray(coords[sel])))
        print(
            f"D tile {h}: n {int(sel.sum()):4d}  r2 gain {r2_gain(res[sel], p):+.4f}  "
            f"lam {float(m.lam):.3e}  eff_df {float(m.eff_df):.1f}"
        )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
