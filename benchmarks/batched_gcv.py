"""BASELINE config 3: synthetic 10k stations x 19 bioclim-style responses,
batched GCV lambda sweep across response variables.

One factorisation (QR + eigendecomposition) serves all 19 responses; the GCV
grid search and coefficient solves are vectorised over the response axis —
the design replacing the reference's serial per-layer loop (V73:203).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stations", type=int, default=2048)
    ap.add_argument("--responses", type=int, default=19)
    ap.add_argument("--host", action="store_true", help="time the f64 host solver instead")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from machisplin_tpu.ops.host_tps import tps_fit_host
    from machisplin_tpu.ops.tps import tps_factor, tps_solve

    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 1, (args.stations, 2)).astype(np.float32)
    ys = np.stack(
        [
            np.sin((3 + 0.2 * j) * coords[:, 0]) * np.cos((2 + 0.1 * j) * coords[:, 1])
            + 0.05 * rng.standard_normal(args.stations)
            for j in range(args.responses)
        ],
        axis=1,
    ).astype(np.float32)

    if args.host:
        t0 = time.perf_counter()
        model = tps_fit_host(coords, ys)
        dt = time.perf_counter() - t0
        lam = np.asarray(model.lam)
    else:
        solve = jax.jit(lambda c, y: tps_solve(tps_factor(c), y, ngrid=128, refine=24))
        model = solve(jnp.asarray(coords), jnp.asarray(ys))
        jax.block_until_ready(model.c)
        t0 = time.perf_counter()
        model = solve(jnp.asarray(coords), jnp.asarray(ys))
        lam = np.asarray(model.lam)  # readback forces completion
        dt = time.perf_counter() - t0
    print(
        f"batched GCV: {args.stations} stations x {args.responses} responses "
        f"in {dt:.2f}s ({args.responses / dt:.1f} responses/s)"
    )
    print("lambda range: %.3g .. %.3g" % (lam.min(), lam.max()))


if __name__ == "__main__":
    main()
