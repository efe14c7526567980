"""Per-algorithm CV cost on the bundled workload — where do the non-BRT
seconds of mltps's cv_all_responses phase go?

TIMING r03: cv_all_responses 44.3 s warm while the 200 gbm.step chains
alone are 23.4 s (CV_PHASE.json); this times run_cv(algorithms=<letter>)
per letter (both responses, production CVConfig) to attribute the rest.

Run on the TPU:  python benchmarks/cv_letter_bench.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from machisplin_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from machisplin_tpu.data import load_sampling, synthetic_covariates
    from machisplin_tpu.ensemble import CVConfig
    from machisplin_tpu.ensemble.cv import run_cv
    from machisplin_tpu.grid import extract
    from machisplin_tpu.pipeline.mltps import _prepare_inputs

    dat = load_sampling()
    covars = synthetic_covariates(downsample=1)
    _, _, _, x, responses = _prepare_inputs(dat, covars)
    ys = np.stack(list(responses.values()), axis=1)        # (n, 2) as mltps runs it
    cfg = CVConfig()

    out = {}
    for letter in "bgnmrv":
        walls = []
        for rep in range(2):
            t0 = time.perf_counter()
            run_cv(jax.random.PRNGKey(7), x, ys, algorithms=letter, config=cfg)
            walls.append(time.perf_counter() - t0)
        out[letter] = round(min(walls), 2)
        print(letter, out[letter], flush=True)
    out["backend"] = jax.default_backend()
    print(json.dumps(out))
    rnd = os.environ.get("MACHISPLIN_ROUND", "5")
    art = os.path.join(os.path.dirname(__file__), "..", "artifacts", f"round{rnd}")
    os.makedirs(art, exist_ok=True)
    with open(os.path.join(art, f"CV_LETTERS_r{rnd.zfill(2)}.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
