"""Why does bio_12 stop at ~0.94 final R^2 while bio_1 reaches 0.996?

Round-2 VERDICT (next #3) asked for the bio_1 methodology applied to the
precip layer: replay the bio_12 ensemble-residual field through the TPS
on the f32 device path vs the f64 host twin, check the GCV lambda against
the host twin, and test whether a per-response lambda floor or the
single-tile layout is the limiter — or whether the synthetic covariates
are (reference pitch: "all with R2>0.99", README.md:55-56, on the REAL
alt/slope/TWI rasters, which are strong precip predictors in N. Peru).

Four experiments (CPU, f64-capable; run:
  MACHISPLIN_TEST_REEXEC=1 JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python benchmarks/diagnose_bio12.py):

1. f32-path vs f64-host GCV on the SAME residual field: lambda, eff.df,
   training-R^2 gain.  (A mismatch would repeat the round-1 precision bug.)
2. lambda sweep with 5-fold station-holdout CV of the TPS correction:
   where is the GENERALIZATION-optimal lambda, and how much training R^2
   would chasing it buy?  (Training R^2 -> 1 as lambda -> 0 by
   interpolation, so training R^2 alone cannot justify a smaller lambda.)
3. The same sweep for bio_1 as the control.
4. A covariate-enrichment run: add one smooth "wetness" band (a heavily
   smoothed precip surface, mimicking the real TWI/alt information) and
   re-run the reduced pipeline — if bio_12 then clears ~0.99, the limiter
   is the synthetic covariate stack, not the spline.

Writes artifacts/round3/BIO12_DIAGNOSIS.json.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "round3", "BIO12_DIAGNOSIS.json",
)


def reduced_config(mt, CVConfig):
    return mt.MLTPSConfig(
        cv=CVConfig(
            n_folds=4,
            brt=dict(tree_complexity=3, learning_rate=0.1, step_size=20, max_trees=100),
            rf=dict(ntree=16, tree_chunk=8),
            nn=dict(hidden=6, maxit=60),
            svm=dict(epochs=60),
        ),
        final_brt=dict(tree_complexity=3, learning_rate=0.05, step_size=20, max_trees=200),
        final_rf=dict(ntree=16, tree_chunk=8),
        final_nn=dict(hidden=6, maxit=60),
        final_svm=dict(epochs=60),
        svm_importance_sample=30,
        use_pallas=False,
    )


def r2_of(y, pred):
    return 1.0 - np.sum((y - pred) ** 2) / np.sum((y - y.mean()) ** 2)


def tps_gain(coords, resid, y, lam=None, host=False):
    """Training R^2 of ensemble+TPS(resid) at the stations for a given lam."""
    import jax.numpy as jnp

    from machisplin_tpu.ops.host_tps import tps_fit_host
    from machisplin_tpu.ops.tps import tps_fit, tps_predict

    if host:
        model = tps_fit_host(coords, np.asarray(resid, np.float64), lam=lam)
    else:
        model = tps_fit(
            jnp.asarray(coords, jnp.float32), jnp.asarray(resid, jnp.float32), lam=lam
        )
    corr = np.asarray(tps_predict(model, jnp.asarray(coords, jnp.float32)))
    ens = y - resid                       # ensemble prediction at stations
    return (
        float(r2_of(y, ens + corr)),
        float(np.asarray(model.lam)),
        float(np.asarray(model.eff_df)),
    )


def cv_lambda_sweep(coords, resid, y, lams, k=5, seed=0):
    """Station-holdout CV of the TPS correction at fixed lambdas."""
    import jax.numpy as jnp

    from machisplin_tpu.ops.host_tps import tps_fit_host
    from machisplin_tpu.ops.tps import tps_predict

    rng = np.random.default_rng(seed)
    n = len(resid)
    fold = rng.permutation(n) % k
    ens = y - resid
    out = []
    for lam in lams:
        sse, sse0 = 0.0, 0.0
        for f in range(k):
            tr, te = fold != f, fold == f
            model = tps_fit_host(coords[tr], np.asarray(resid[tr], np.float64), lam=lam)
            corr = np.asarray(tps_predict(model, jnp.asarray(coords[te], jnp.float32)))
            sse += float(np.sum((y[te] - ens[te] - corr) ** 2))
            sse0 += float(np.sum((y[te] - y.mean()) ** 2))
        out.append({"lambda": float(lam), "cv_r2": 1.0 - sse / sse0})
    return out


def cv_tiled_vs_single(coords, resid, y, k=5, seed=0, nt=3, halo=0.2):
    """Experiment 5 — is the SINGLE-TILE layout the limiter?  Station-holdout
    CV of the TPS correction fitted (a) as one global GCV spline and (b) as
    an nt x nt tile mosaic with +-halo fit extents and PER-TILE GCV lambda
    (the locally-adaptive smoothing a tiled layout buys, mltps part 3's
    geometry, V73:650-681).  If local lambda adaptation helped, (b) > (a)."""
    import jax.numpy as jnp

    from machisplin_tpu.ops.host_tps import tps_fit_host
    from machisplin_tpu.ops.tps import tps_predict

    rng = np.random.default_rng(seed)
    n = len(resid)
    fold = rng.permutation(n) % k
    ens = y - resid
    lo, hi = coords.min(0), coords.max(0)
    span = hi - lo
    edges_x = lo[0] + span[0] * np.linspace(0, 1, nt + 1)
    edges_y = lo[1] + span[1] * np.linspace(0, 1, nt + 1)

    sse_s, sse_t, sse0 = 0.0, 0.0, 0.0
    lam_range = []
    for f in range(k):
        tr, te = fold != f, fold == f
        # (a) single global spline, GCV lambda
        m_g = tps_fit_host(coords[tr], np.asarray(resid[tr], np.float64))
        corr_g = np.asarray(tps_predict(m_g, jnp.asarray(coords[te], jnp.float32)))
        sse_s += float(np.sum((y[te] - ens[te] - corr_g) ** 2))
        sse0 += float(np.sum((y[te] - y.mean()) ** 2))
        # (b) per-tile GCV splines with halo fit extents
        corr_t = np.zeros(int(te.sum()))
        cte = coords[te]
        for i in range(nt):
            for j in range(nt):
                x0, x1 = edges_x[i], edges_x[i + 1]
                y0, y1 = edges_y[j], edges_y[j + 1]
                hx, hy = halo * (x1 - x0), halo * (y1 - y0)
                in_fit = (
                    (coords[:, 0] >= x0 - hx) & (coords[:, 0] <= x1 + hx)
                    & (coords[:, 1] >= y0 - hy) & (coords[:, 1] <= y1 + hy)
                    & tr
                )
                in_core = (
                    (cte[:, 0] >= x0) & (cte[:, 0] < x1 + (i == nt - 1))
                    & (cte[:, 1] >= y0) & (cte[:, 1] < y1 + (j == nt - 1))
                )
                if int(in_fit.sum()) < 10:   # the <10-point zero-tile guard
                    continue
                m_l = tps_fit_host(coords[in_fit], np.asarray(resid[in_fit], np.float64))
                lam_range.append(float(np.asarray(m_l.lam)))
                if in_core.any():
                    corr_t[in_core] = np.asarray(
                        tps_predict(m_l, jnp.asarray(cte[in_core], jnp.float32))
                    )
        sse_t += float(np.sum((y[te] - ens[te] - corr_t) ** 2))
    return {
        "single_tile_cv_r2": 1.0 - sse_s / sse0,
        "tiled_cv_r2": 1.0 - sse_t / sse0,
        "tiles": f"{nt}x{nt}, {halo:.0%} halo, per-tile GCV",
        "per_tile_lambda_range": [min(lam_range), max(lam_range)] if lam_range else None,
    }


def main():
    import jax
    import jax.numpy as jnp

    import machisplin_tpu as mt
    from machisplin_tpu.data import load_sampling, synthetic_covariates
    from machisplin_tpu.ensemble import CVConfig
    from machisplin_tpu.grid import Raster, extract, stack
    from machisplin_tpu.ops.tps import tps_fit, tps_predict_grid

    report = {}
    if "--exp5-only" in sys.argv and os.path.exists(OUT):
        with open(OUT) as f:
            report = json.load(f)
    dat = load_sampling()
    covars = synthetic_covariates(downsample=24)
    cfg = reduced_config(mt, CVConfig)

    # ---- ensemble residual fields (tps=False keeps them un-corrected) -----
    out = mt.mltps(dat, covars, tps=False, config=cfg, key=jax.random.PRNGKey(0))
    fields = {}
    for r in out:
        resid = r.residuals[:, 0]
        coords = r.residuals[:, 1:3]
        y = np.asarray(dat[r.name])
        keep_n = len(resid)
        fields[r.name] = (coords, resid, y[:keep_n])
        report.setdefault("ensemble", {})[r.name] = {
            "r2_ensemble": float(r.summary["r2 ensemble:"]),
            "residual_sd_fraction": float(np.std(resid) / np.std(y)),
        }

    # ---- experiment 5: tiled (locally-adaptive lambda) vs single tile -----
    report["tiled_vs_single"] = {
        name: cv_tiled_vs_single(coords, resid, y)
        for name, (coords, resid, y) in fields.items()
    }
    if "--exp5-only" in sys.argv:
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)
        print(json.dumps(report["tiled_vs_single"], indent=1))
        print("wrote", OUT)
        return

    # ---- experiment 1: f32 path vs f64 host twin --------------------------
    report["gcv_paths"] = {}
    for name, (coords, resid, y) in fields.items():
        r2_dev, lam_dev, df_dev = tps_gain(coords, resid, y, host=False)
        r2_host, lam_host, df_host = tps_gain(coords, resid, y, host=True)
        report["gcv_paths"][name] = {
            "f32_device_path": {"lambda": lam_dev, "eff_df": df_dev, "r2_final": r2_dev},
            "f64_host_twin": {"lambda": lam_host, "eff_df": df_host, "r2_final": r2_host},
            "lambda_log10_gap": float(np.log10(max(lam_dev, 1e-300) / max(lam_host, 1e-300))),
        }

    # ---- experiments 2+3: lambda sweep with station-holdout CV ------------
    report["lambda_sweep"] = {}
    for name, (coords, resid, y) in fields.items():
        lam_gcv = report["gcv_paths"][name]["f64_host_twin"]["lambda"]
        lams = lam_gcv * np.float64(10.0) ** np.arange(-3, 3.5, 0.5)
        sweep = cv_lambda_sweep(coords, resid, y, lams)
        for row, lam in zip(sweep, lams):
            row["train_r2"] = tps_gain(coords, resid, y, lam=lam, host=True)[0]
        best = max(sweep, key=lambda r: r["cv_r2"])
        report["lambda_sweep"][name] = {
            "gcv_lambda": lam_gcv,
            "rows": sweep,
            "cv_optimal_lambda": best["lambda"],
            "cv_optimal_r2": best["cv_r2"],
            "log10_gcv_vs_cv_optimal": float(np.log10(lam_gcv / best["lambda"])),
        }

    # ---- experiment 4: covariate enrichment -------------------------------
    # one extra smooth band carrying real precip information (a strongly
    # smoothed TPS of bio_12 itself — the role alt/TWI play for the
    # reference's real stack)
    coords_all = np.stack([dat["long"], dat["lat"]], axis=1)
    y12 = np.asarray(dat["bio_12"], np.float64)
    wet_model = tps_fit(
        jnp.asarray(coords_all, jnp.float32), jnp.asarray(y12, jnp.float32),
        lam=1e-3,   # heavy smoothing: a coarse climate-scale field only
    )
    wet_band = tps_predict_grid(wet_model, covars.grid, use_pallas=False)
    covars_plus = stack([
        covars,
        Raster(wet_band[None] if wet_band.ndim == 2 else wet_band, covars.grid, ("wetness",)),
    ])
    out_plus = mt.mltps(dat, covars_plus, tps=True, config=cfg, key=jax.random.PRNGKey(0))
    report["enriched_covariates"] = {
        r.name: {
            "r2_ensemble": float(r.summary["r2 ensemble:"]),
            "r2_final": float(r.summary.get("r2 final:", np.nan)),
        }
        for r in out_plus
    }

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    print("wrote", OUT)


if __name__ == "__main__":
    main()
