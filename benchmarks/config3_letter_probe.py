"""Probe config-3-scale CV letters one at a time (crash localization).

Builds the exact config3_pipeline station set (10k x 19, 3 covariate
columns) and runs run_cv with ONE letter, so a TPU worker crash or stall
is attributable.  Usage: python benchmarks/config3_letter_probe.py n [m v r b]
"""
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s",
                    stream=sys.stdout)


def main():
    letters = sys.argv[1:] or ["n"]
    import jax
    import jax.numpy as jnp

    from machisplin_tpu.ensemble.cv import CVConfig, run_cv
    from machisplin_tpu.grid import GridSpec, Raster, extract
    from machisplin_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(3)
    side, n_stations, n_resp = 4000, 10000, 19
    g = GridSpec(nrows=side, ncols=side, xmin=0.0, ymax=1.0,
                 dx=1.0 / side, dy=1.0 / side)
    xs = np.linspace(0, 1, side, dtype=np.float32)
    world = (
        1000.0
        + 2500.0 * np.exp(-(((xs[None, :] - 0.4) ** 2) + (xs[:, None] - 0.6) ** 2) / 0.05)
        + 300.0 * np.sin(9 * xs[None, :]) * np.cos(7 * xs[:, None])
    ).astype(np.float32)
    covars = Raster.host(world[None], g, ("alt",))
    lon = rng.uniform(0.001, 0.999, n_stations)
    lat = rng.uniform(0.001, 0.999, n_stations)
    alt = np.asarray(extract(covars, lon, lat))[:, 0]
    ys = np.stack(
        [
            8.0 * np.sin((3 + i % 5) * lon) * np.cos((2 + i % 7) * lat)
            - 0.004 * alt
            + 0.3 * rng.standard_normal(n_stations)
            for i in range(n_resp)
        ],
        axis=1,
    ).astype(np.float32)
    x = jnp.asarray(np.column_stack([alt, lon, lat]), jnp.float32)

    for letter in letters:
        t0 = time.perf_counter()
        out = run_cv(
            jax.random.fold_in(jax.random.PRNGKey(55), 777),
            x, jnp.asarray(ys), config=CVConfig(), algorithms=letter,
        )
        rms = float(np.sqrt(np.mean(out[letter] ** 2)))
        print(f"LETTER {letter}: {time.perf_counter() - t0:.1f} s, "
              f"residual RMS {rms:.4f}", flush=True)


if __name__ == "__main__":
    main()
