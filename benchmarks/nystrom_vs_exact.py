"""Measure the Nyström-vs-exact TPS error bound behind tps_fit_auto's policy.

Round-4 (VERDICT next #5): at 10k+ knots tps_fit_auto defaults to the
reduced-basis Nyström fit (70x cheaper than the exact f64 host factorisation
at the config-3 shape).  This script produces the measured bound that blesses
that default: fit the SAME stations exactly (ops/host_tps.py, f64) and with
the Nyström basis (ops/nystrom.py), then compare

  * agreement: R^2 of the Nyström predictions against the exact fit's
    predictions at held-out points (how much of the exact surface the
    reduced basis reproduces);
  * holdout accuracy vs truth for both fits (does the cheap path actually
    cost accuracy where it matters);
  * residual-scale inflation: rms(nystrom holdout error)/rms(exact).

Shapes default to n=6000 so the exact f64 eigh stays tractable on this
container's single core; pass --n to rerun at other scales.  CPU-safe:
launch with the conftest env (JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=).

Usage: python benchmarks/nystrom_vs_exact.py [--n 6000] [--m 2048]
Writes benchmarks/nystrom_vs_exact.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def field(pts, j):
    """Smooth synthetic residual-like fields (the TPS correction's regime)."""
    x, y = pts[:, 0], pts[:, 1]
    if j == 0:
        return np.sin(3.1 * x) * np.cos(2.3 * y) + 0.4 * np.sin(8.0 * x * y)
    return np.cos(4.0 * x) + 0.6 * np.sin(5.0 * y) * x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6000)
    ap.add_argument("--m", type=int, default=2048)
    ap.add_argument("--holdout", type=int, default=4000)
    args = ap.parse_args()

    import jax.numpy as jnp

    from machisplin_tpu.ops.host_tps import tps_fit_host
    from machisplin_tpu.ops.nystrom import nystrom_tps_fit
    from machisplin_tpu.ops.tps import tps_predict

    rng = np.random.default_rng(7)
    coords = rng.uniform(0, 1, (args.n, 2))
    noise = 0.05
    ys = np.stack([field(coords, j) for j in range(2)], axis=1)
    ys = ys + noise * rng.standard_normal(ys.shape)
    hold = rng.uniform(0.02, 0.98, (args.holdout, 2))
    truth = np.stack([field(hold, j) for j in range(2)], axis=1)

    cj = jnp.asarray(coords, jnp.float32)
    yj = jnp.asarray(ys, jnp.float32)

    t0 = time.time()
    exact = tps_fit_host(cj, yj)
    t_exact = time.time() - t0
    t0 = time.time()
    nys = nystrom_tps_fit(cj, yj, m=args.m)
    float(jnp.nansum(nys.c))
    t_nys = time.time() - t0

    pe = np.asarray(tps_predict(exact, jnp.asarray(hold, jnp.float32)))
    pn = np.asarray(tps_predict(nys, jnp.asarray(hold, jnp.float32)))

    out = {
        "n": args.n, "m": args.m, "noise": noise,
        "exact_solve_s": round(t_exact, 2), "nystrom_solve_s": round(t_nys, 2),
        "speedup": round(t_exact / t_nys, 1),
        "per_response": [],
    }
    for j in range(2):
        sse_agree = float(np.sum((pn[:, j] - pe[:, j]) ** 2))
        sst_e = float(np.sum((pe[:, j] - pe[:, j].mean()) ** 2))
        rms_e = float(np.sqrt(np.mean((pe[:, j] - truth[:, j]) ** 2)))
        rms_n = float(np.sqrt(np.mean((pn[:, j] - truth[:, j]) ** 2)))
        out["per_response"].append({
            "r2_nystrom_vs_exact_surface": round(1.0 - sse_agree / sst_e, 6),
            "holdout_rms_exact": round(rms_e, 5),
            "holdout_rms_nystrom": round(rms_n, 5),
            "holdout_rms_ratio": round(rms_n / rms_e, 4),
            "lambda_exact": float(np.asarray(exact.lam)[j]),
            "lambda_nystrom": float(np.asarray(nys.lam)[j]),
        })
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "nystrom_vs_exact.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
