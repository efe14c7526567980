"""A/B: serial gbm_step.fit vs response-batched fit_multi — BRT final fits.

Round-4 TIMING showed final_fit_b_x2 at 21.1 s where round 3's serial fits
took 16.0 s (10.6 + 5.5).  Hypothesis: on a SINGLE chip the batched CV
curve advances every response to the group's max stopping point and the
final refits run at the max padded budget, so the batched cost is
~2 x max(serial) instead of sum(serial) — batching only pays when the
response axis shards across a mesh (or when chains are latency-bound,
which the final-fit shapes apparently are not).

This measures both paths on the bundled 813-station data at the pipeline's
final-fit hyperparameters (tc=5, lr=0.001 — MLTPSConfig.final_brt), warm
(second run of each), and prints per-response best_trees so the padding
arithmetic is visible.  The result decides mltps's single-device default
for ``batch_final_brt`` (the repo's measure-before-believing doctrine).

Run on the real TPU (default env): python benchmarks/brt_final_ab.py
Writes benchmarks/brt_final_ab.json.
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
    import jax.numpy as jnp

    from machisplin_tpu.models import gbm_step
    from machisplin_tpu.pipeline.mltps import MLTPSConfig
    from machisplin_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    print("backend:", jax.default_backend(), flush=True)
    d = np.genfromtxt(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "machisplin_tpu", "data", "sampling.csv"),
        delimiter=",", names=True,
    )
    # station covariates as the pipeline builds them: the raster stack is
    # synthetic here, but fit cost depends only on (n, p) and the chain
    # lengths, so raw station columns + coords are a faithful stand-in
    x = np.stack([d["long"], d["lat"], d["bio_1"] * 0 + 1.0], 1)
    rng = np.random.default_rng(0)
    x = np.concatenate([x[:, :2], rng.standard_normal((len(d), 5))], 1)
    x = jnp.asarray(x.astype(np.float32))
    ycols = jnp.asarray(
        np.stack([d["bio_1"], d["bio_12"]], 1).astype(np.float32)
    )
    cfg = MLTPSConfig().final_brt
    print("final_brt config:", cfg, flush=True)
    key = jax.random.PRNGKey(42)
    keys = jnp.stack([jax.random.fold_in(key, i) for i in range(2)])

    def run_serial():
        outs = []
        for j in range(2):
            outs.append(gbm_step.fit(keys[j], x, ycols[:, j], **cfg))
        # force completion
        for r in outs:
            float(jnp.nansum(r.final.train_fit))
        return outs

    def run_multi():
        outs = gbm_step.fit_multi(keys, x, ycols, **cfg)
        for r in outs:
            float(jnp.nansum(r.final.train_fit))
        return outs

    report = {}
    for name, fn in (("serial", run_serial), ("fit_multi", run_multi)):
        t0 = time.time(); outs = fn(); cold = time.time() - t0
        t0 = time.time(); outs = fn(); warm = time.time() - t0
        t0 = time.time(); outs = fn(); warm2 = time.time() - t0
        bt = [int(r.best_trees) for r in outs]
        lr = [float(r.learning_rate) for r in outs]
        rs = [int(r.restarts) for r in outs]
        print(f"{name}: cold {cold:.1f}s warm {warm:.1f}/{warm2:.1f}s "
              f"best_trees={bt} lr={lr} restarts={rs}", flush=True)
        report[name] = dict(cold_s=round(cold, 2), warm_s=round(min(warm, warm2), 2),
                            best_trees=bt, lr=lr, restarts=rs)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "brt_final_ab.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
