"""BASELINE configs 3-5 on the available hardware, recorded as JSON.

Writes benchmarks/results_r{N}.json with one entry per config shape
(VERDICT round 1 asked for recorded artifacts, not just runnable scripts):

  config3  10k stations x 19 responses — one shared factorisation, batched
           GCV + coefficient solve across the response axis (the design
           replacing the reference's serial per-layer loop, V73:203).
  config4  50k stations over ~1e8 cells — Nystrom reduced-basis solve +
           streamed Pallas grid prediction (tiles.create/merge scale posture,
           README.md:157-215; single chip here, v5e-8 target in BASELINE).
  config5  500k knots via Nystrom over a ~1e9-cell grid geometry — predict
           timed over a sampled row band and extrapolated (full surface
           wall = cells / measured Mcells/s; memory never holds the grid).

Run on the real TPU (default env):  python benchmarks/run_configs.py [--round 2]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def _force(x):
    import jax.numpy as jnp

    return float(jnp.nansum(x))


def config3(jax, jnp):
    # n=10000 exact eigendecomposition OOMs one v5e chip (XLA's QDWH eigh
    # wants 17.3 GB of 15.75 GB HBM); n=8192 is the single-chip ceiling,
    # recorded here — the 10k-station full config targets multi-chip.  The
    # point of the config is the BATCHED response sweep: one factorisation,
    # 19 GCV searches + coefficient solves vectorised over responses.
    from machisplin_tpu.ops.tps import tps_factor, tps_solve

    rng = np.random.default_rng(0)
    n, r = 8192, 19
    coords = rng.uniform(0, 1, (n, 2)).astype(np.float32)
    ys = np.stack(
        [
            np.sin((3 + 0.2 * j) * coords[:, 0]) * np.cos((2 + 0.1 * j) * coords[:, 1])
            + 0.05 * rng.standard_normal(n)
            for j in range(r)
        ],
        axis=1,
    ).astype(np.float32)
    solve = jax.jit(lambda c, y: tps_solve(tps_factor(c), y, ngrid=128, refine=24))
    model = solve(jnp.asarray(coords), jnp.asarray(ys))
    _force(model.c)  # compile + settle
    t0 = time.perf_counter()
    model = solve(jnp.asarray(coords), jnp.asarray(ys))
    lam = np.asarray(model.lam)
    dt = time.perf_counter() - t0
    return {
        "config": 3,
        "shape": f"{n} stations x {r} responses, shared factorisation "
                 "(10000 exceeds one chip's HBM in eigh; see source note)",
        "solve_s": round(dt, 3),
        "responses_per_s": round(r / dt, 2),
        "lambda_range": [float(lam.min()), float(lam.max())],
    }


def config4(jax, jnp):
    from machisplin_tpu.grid import GridSpec
    from machisplin_tpu.ops.nystrom import nystrom_tps_fit
    from machisplin_tpu.ops.tps import tps_predict_grid

    rng = np.random.default_rng(0)
    stations, cells, m = 50000, 1e8, 2048
    side = int(math.sqrt(cells))
    grid = GridSpec(nrows=side, ncols=side, xmin=0.0, ymax=1.0, dx=1 / side, dy=1 / side)
    coords = rng.uniform(0, 1, (stations, 2)).astype(np.float32)
    y = (
        np.sin(6 * coords[:, 0]) * np.cos(5 * coords[:, 1])
        + 0.1 * rng.standard_normal(stations)
    ).astype(np.float32)
    def solve():
        mdl = nystrom_tps_fit(
            jnp.asarray(coords), jnp.asarray(y), m=m,
            key=jax.random.PRNGKey(0), chunk=16384,
        )
        return mdl, float(mdl.lam)

    t0 = time.perf_counter()
    model, lam = solve()
    t_cold = time.perf_counter() - t0   # includes one-time XLA compiles
    t0 = time.perf_counter()
    model, lam = solve()
    t_solve = time.perf_counter() - t0  # warm: the real solver cost
    panel = 1536
    t0 = time.perf_counter()
    total, checksum = 0, 0.0
    for r0 in range(0, grid.nrows, panel):
        sub = grid.subgrid(r0, min(r0 + panel, grid.nrows), 0, grid.ncols)
        checksum += _force(tps_predict_grid(model, sub))
        total += sub.ncell
    dt = time.perf_counter() - t0
    return {
        "config": 4,
        "shape": f"{stations} stations -> {m} landmarks, {total/1e6:.0f} Mcells streamed",
        "solve_cold_s": round(t_cold, 2),
        "solve_s": round(t_solve, 2),
        "predict_s": round(dt, 2),
        "mcells_per_s": round(total / dt / 1e6, 2),
        "end_to_end_s": round(t_solve + dt, 2),
        "lambda": lam,
        "checksum": checksum,
    }


def config5(jax, jnp):
    from machisplin_tpu.grid import GridSpec
    from machisplin_tpu.ops.nystrom import nystrom_tps_fit
    from machisplin_tpu.ops.tps import tps_predict_grid

    rng = np.random.default_rng(1)
    stations, m = 500000, 4096
    side = 31623  # ~1e9 cells
    grid = GridSpec(nrows=side, ncols=side, xmin=0.0, ymax=1.0, dx=1 / side, dy=1 / side)
    coords = rng.uniform(0, 1, (stations, 2)).astype(np.float32)
    y = (
        np.sin(8 * coords[:, 0]) * np.cos(7 * coords[:, 1])
        + 0.1 * rng.standard_normal(stations)
    ).astype(np.float32)
    def solve():
        mdl = nystrom_tps_fit(
            jnp.asarray(coords), jnp.asarray(y), m=m,
            key=jax.random.PRNGKey(0), chunk=32768,
        )
        return mdl, float(mdl.lam)

    t0 = time.perf_counter()
    model, lam = solve()
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    model, lam = solve()
    t_solve = time.perf_counter() - t0
    # time a representative band, extrapolate the full-surface wall
    band_rows = 2048
    sub = grid.subgrid(0, band_rows, 0, grid.ncols)
    _force(tps_predict_grid(model, sub))  # compile
    t0 = time.perf_counter()
    checksum = _force(tps_predict_grid(model, sub))
    dt_band = time.perf_counter() - t0
    mcells = sub.ncell / dt_band / 1e6
    return {
        "config": 5,
        "shape": f"{stations} knots -> {m} landmarks, {grid.ncell/1e9:.2f} Gcell grid",
        "solve_cold_s": round(t_cold, 2),
        "solve_s": round(t_solve, 2),
        "band_mcells_per_s": round(mcells, 2),
        "extrapolated_full_surface_s": round(grid.ncell / (mcells * 1e6), 1),
        "lambda": lam,
        "checksum": checksum,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=2)
    ap.add_argument("--only", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from machisplin_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    out = os.path.join(HERE, f"results_r{args.round:02d}.json")
    results = {}
    if args.only and os.path.exists(out):  # --only reruns merge, not clobber
        with open(out) as f:
            results = json.load(f)
    results.update({"backend": jax.default_backend(), "device_count": jax.device_count()})
    runs = {3: config3, 4: config4, 5: config5}
    for num, fn in runs.items():
        if args.only and num != args.only:
            continue
        t0 = time.perf_counter()
        try:
            results[f"config{num}"] = fn(jax, jnp)
        except Exception as e:  # record the failure rather than losing the rest
            results[f"config{num}"] = {"config": num, "error": repr(e)}
        print(f"config{num}: {json.dumps(results[f'config{num}'])} "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
