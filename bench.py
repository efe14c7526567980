"""Benchmark: TPS solve + full-grid prediction on the bundled workload.

Primary metric (BASELINE.json): "TPS solve+grid-predict Mcells/sec" on the
reference's bundled configuration — 813 stations x 2 responses (sampling.csv)
predicted over the 3264 x 2476 (~8.08 M cell) covariate grid geometry
(inst/extdata/alt.tfw).  The solve is the GCV-selected multi-response
factorisation; prediction uses the Pallas fused distance/phi/matvec kernel on
TPU (jnp fallback elsewhere).

vs_baseline: the reference has no published numbers (BASELINE.md), so the
baseline is an estimate of fields::Tps + terra::interpolate on a laptop-class
CPU for the same workload: the 8.08M x 813 kernel evaluation is ~6.6 G
transcendentals + 1.3e13 matmul flops, which lands at roughly 160 s in
single-threaded Fortran/BLAS (~0.05 Mcells/s).  vs_baseline = value / 0.05.
"""
import json
import time

import numpy as np


def main():
    import jax

    from machisplin_tpu.grid import GridSpec
    from machisplin_tpu.ops.host_tps import tps_fit_host
    from machisplin_tpu.ops.tps import tps_predict_grid

    data = np.genfromtxt("machisplin_tpu/data/sampling.csv", delimiter=",", names=True)
    coords = np.stack([data["long"], data["lat"]], 1)
    ys = np.stack([data["bio_1"], data["bio_12"]], 1)

    # the reference grid geometry: 3264 cols x 2476 rows at ~90 m (alt.tfw)
    grid = GridSpec(
        nrows=2476, ncols=3264,
        xmin=-77.7435765934, ymax=-5.8094167820,
        dx=0.0008333333, dy=0.0008333333,
    )

    on_tpu = jax.default_backend() in ("tpu", "axon")

    import jax.numpy as jnp

    def run():
        # production split: O(n^3) GCV factorisation on the host in f64
        # (milliseconds at n=813; device QR/eigh compile cost is not worth
        # paying here), knots-by-cells matvec on the TPU (Pallas kernel).
        # A scalar readback forces completion — block_until_ready is not
        # reliable on the axon tunnel backend.
        model = tps_fit_host(coords, ys)
        surf = tps_predict_grid(model, grid, use_pallas=on_tpu)
        return float(jnp.nansum(surf))

    t0 = time.perf_counter()
    run()  # warm-up / compile
    warm = time.perf_counter() - t0
    times = []
    for _ in range(3 if warm < 30 else 1):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    mcells = grid.ncell / dt / 1e6
    baseline_mcells = 0.05  # estimated fields::Tps+terra::interpolate, see module docstring
    print(json.dumps({
        "metric": "tps_solve_plus_grid_predict",
        "value": round(mcells, 3),
        "unit": "Mcells/s",
        "vs_baseline": round(mcells / baseline_mcells, 1),
    }))


if __name__ == "__main__":
    main()
