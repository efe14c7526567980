"""TPU-side half of the TPS-correction regression diagnosis (VERDICT weak #4).

benchmarks/diagnose_tps_correction.py showed the tiled TPS path recovers
+0.94 station R^2 on the round-1 bio_1 ensemble residuals when solved and
predicted on CPU — yet the round-1 real-TPU run recorded ~0 gain (bio_12)
and NEGATIVE gain (bio_1).  The suspects are therefore the two TPU-only
components:

  * the on-device f32 factorisation (TPU QR/eigh is an iterative
    approximation, far less accurate than LAPACK's f32, and the tiny
    GCV-selected rho divides by near-zero eigenvalues), and
  * the Pallas grid-prediction kernel.

This script isolates them on the real chip:

  A. device solve + direct jnp spline evaluation at the stations;
  B. host (f64 LAPACK) solve + Pallas grid predict + cell extraction;
  C. device solve + Pallas grid predict + cell extraction  (the round-1 mix);

Run with the DEFAULT environment (axon TPU backend):
    python benchmarks/diagnose_tps_tpu.py [downsample]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main(downsample: int = 4):
    import jax
    import jax.numpy as jnp

    from machisplin_tpu.data import example_grid
    from machisplin_tpu.grid import Raster, extract
    from machisplin_tpu.ops.host_tps import tps_fit_host
    from machisplin_tpu.ops.tps import tps_fit, tps_predict, tps_predict_grid

    print("backend:", jax.default_backend(), flush=True)
    csv = os.path.join(os.path.dirname(HERE), "artifacts/round1/bio_1_residuals.csv")
    tab = np.genfromtxt(csv, delimiter=",", skip_header=1)
    res = np.asarray(tab[:, 1], np.float64)
    coords = np.asarray(tab[:, 2:4], np.float64)
    g = example_grid(downsample)

    def gain(corr):
        return 1.0 - np.sum((res - corr) ** 2) / np.sum(res**2)

    coords_d = jnp.asarray(coords, jnp.float32)
    res_d = jnp.asarray(res, jnp.float32)

    # A: device solve, direct evaluation at stations (no pallas)
    t0 = time.time()
    solve = jax.jit(lambda c, y: tps_fit(c, y))
    model_dev = solve(coords_d, res_d)
    at_a = np.asarray(tps_predict(model_dev, coords_d))
    print(
        f"A device-solve @points : gain {gain(at_a):+.4f}  "
        f"lam {float(model_dev.lam):.3e}  eff_df {float(model_dev.eff_df):.1f}  "
        f"({time.time()-t0:.0f}s)", flush=True,
    )

    # B: host f64 solve, pallas grid predict
    t0 = time.time()
    model_host = tps_fit_host(coords, res)
    surf_b = tps_predict_grid(model_host, g, use_pallas=True)
    rb = Raster(surf_b, g)
    at_b = np.asarray(extract(rb, coords[:, 0], coords[:, 1]))
    print(f"B host-solve + pallas  : gain {gain(at_b):+.4f}  ({time.time()-t0:.0f}s)", flush=True)

    # C: device solve, pallas grid predict (the round-1 combination)
    t0 = time.time()
    surf_c = tps_predict_grid(model_dev, g, use_pallas=True)
    rc = Raster(surf_c, g)
    at_c = np.asarray(extract(rc, coords[:, 0], coords[:, 1]))
    print(f"C device-solve + pallas: gain {gain(at_c):+.4f}  ({time.time()-t0:.0f}s)", flush=True)

    # reference host-solve evaluation at stations for scale
    at_h = np.asarray(tps_predict(jax.tree.map(jnp.asarray, model_host), coords_d))
    print(f"H host-solve @points   : gain {gain(at_h):+.4f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
