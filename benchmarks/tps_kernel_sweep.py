"""Sweep the production TPS grid kernel's tile parameters on the real chip.

Drives ops/pallas_tps.tps_grid_pallas itself (module constants _BLOCK /
_KNOT_CHUNK are overridden per configuration and the program cache cleared),
so results reflect the shipping kernel.  Slope-timed (k=1 vs k=3 back-to-back
applications, one readback) to cancel the axon tunnel's fixed latency.

Run (axon TPU env):  python benchmarks/tps_kernel_sweep.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from machisplin_tpu.grid import GridSpec
    from machisplin_tpu.ops import pallas_tps
    from machisplin_tpu.ops.tps import tps_fit
    from machisplin_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    print("backend:", jax.default_backend(), flush=True)

    grid = GridSpec(nrows=2048, ncols=2048, xmin=0.0, ymax=1.0,
                    dx=1 / 2048, dy=1 / 2048)
    rng = np.random.default_rng(0)

    for n_knots, n_resp in ((813, 1), (813, 2), (2048, 1)):
        pts = rng.uniform(0, 1, (n_knots, 2)).astype(np.float32)
        ys = np.stack(
            [np.sin((3 + j) * pts[:, 0]) * np.cos(2 * pts[:, 1]) for j in range(n_resp)],
            axis=1,
        ).astype(np.float32)
        y = ys[:, 0] if n_resp == 1 else ys
        model = tps_fit(jnp.asarray(pts), jnp.asarray(y), lam=1e-5)
        for block in (1024, 2048, 4096):
            for chunk in (128, 256, 448, 896):
                pallas_tps._BLOCK = block
                pallas_tps._KNOT_CHUNK = chunk
                pallas_tps._compiled_grid_eval.cache_clear()
                try:
                    def run_k(k):
                        s = None
                        for _ in range(k):
                            t = jnp.nansum(pallas_tps.tps_grid_pallas(model, grid))
                            s = t if s is None else s + t
                        return float(s)

                    run_k(1)  # compile
                    t0 = time.time(); run_k(1); dt1 = time.time() - t0
                    t0 = time.time(); run_k(3); dt3 = time.time() - t0
                    dt = max((dt3 - dt1) / 2, 1e-9)
                    n_pad = -(-n_knots // chunk) * chunk
                    print(
                        f"knots {n_knots:5d} R {n_resp} block {block:5d} chunk {chunk:4d}: "
                        f"{grid.ncell/dt/1e6:8.1f} Mcells/s ({grid.ncell*n_pad/dt:.3g} logs/s)",
                        flush=True,
                    )
                except Exception as e:
                    print(f"knots {n_knots} R {n_resp} block {block} chunk {chunk}: "
                          f"FAIL {type(e).__name__}: {e}", flush=True)
    # restore defaults for any later imports in this process
    pallas_tps._BLOCK = 1024
    pallas_tps._KNOT_CHUNK = 128
    pallas_tps._compiled_grid_eval.cache_clear()


if __name__ == "__main__":
    main()
