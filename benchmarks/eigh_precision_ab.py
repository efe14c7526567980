"""A/B the TPU eigh's internal knobs on the graded solve (round 4).

The graded bench's solve is 100% eigh (artifacts/round3/SOLVE_PROFILE.json:
28.2 ms of a 28.2 ms factorisation at n=813).  jnp.linalg.eigh on TPU is
jax's QDWH polar + spectral divide-and-conquer, hardwired to
precision='float32' — i.e. every internal matmul runs as SIX bf16 passes —
with termination_size=256 sending <=256 blocks to a Jacobi base case.
ops/tps._eigh_sym exposes both knobs.  This script times the FULL
tps_fit on the bundled 813-station workload per knob setting and scores
accuracy against the f64 host twin (ops/host_tps.tps_fit_host), which is
the repo's ground truth for solver changes (BIO12_DIAGNOSIS precedent).

Candidate settings:
  * float32/256     — jnp.linalg.eigh today (the control; must match it)
  * bfloat16_3x/256 — 3-pass matmuls: ~half the MXU work if matmul-bound
  * float32/1024    — n=810 <= termination: the whole problem solves in the
                      Jacobi base case (no QDWH/D&C at all)
  * bfloat16_3x/1024, bfloat16/256 — for the record

Precision doctrine note (CLAUDE.md): the eigh operates on VALUES, so any
non-float32 setting ships ONLY if the fitted surface stays within f32
round-off of the host-f64 twin (the control's own gap sets the yardstick).

Run on the real TPU: python benchmarks/eigh_precision_ab.py
Writes benchmarks/eigh_precision_ab.json.  Timing: slope (k=1 vs k=5, one
readback), best-of-3, per CLAUDE.md tunnel-noise rules.
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

    from machisplin_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import machisplin_tpu.ops.tps as tps_mod
    from machisplin_tpu.ops.host_tps import tps_fit_host

    print("backend:", jax.default_backend(), flush=True)
    data = np.genfromtxt(
        "machisplin_tpu/data/sampling.csv", delimiter=",", names=True
    )
    coords = np.stack([data["long"], data["lat"]], 1)
    ys = np.stack([data["bio_1"], data["bio_12"]], 1)
    coords_d = jnp.asarray(coords, jnp.float32)
    ys_d = jnp.asarray(ys, jnp.float32)
    y_scale = ys.std(axis=0)

    # f64 ground truth (host LAPACK; the repo's solver yardstick)
    ref = tps_fit_host(coords, ys)
    ref_fitted = np.asarray(ref.fitted, np.float64)
    ref_lam = np.asarray(ref.lam, np.float64)

    def slope_time(fn):
        def run_k(k):
            s = None
            for _ in range(k):
                t = jnp.nansum(fn().fitted)
                s = t if s is None else s + t
            return float(s)

        run_k(1)  # compile + settle
        best = np.inf
        for _ in range(3):
            t0 = time.time(); run_k(1); d1 = time.time() - t0
            t0 = time.time(); run_k(5); d5 = time.time() - t0
            best = min(best, max((d5 - d1) / 4, 1e-9))
        return best

    # run 1 (benchmarks/eigh_precision_ab_run1.json) measured: the pure
    # Jacobi base case (termination=1024 >= n) is ~2x SLOWER (54.5 vs
    # 28.2 ms), and raw bfloat16 destroys the fit (gap 0.50 sd).  Run 2
    # uses the precision enum's real names: 'high' = 3-pass bf16 matmuls,
    # 'tensorfloat32' = tf32 passes.
    combos = [
        ("float32", 256),       # control == jnp.linalg.eigh
        ("high", 256),
        ("tensorfloat32", 256),
    ]
    results = []
    control_gap = None
    for prec, term in combos:
        tps_mod._EIGH_PRECISION = prec
        tps_mod._EIGH_TERMINATION = term
        # precision is trace-time state: a fresh jit per setting
        fit = jax.jit(lambda c, y: tps_mod.tps_fit(c, y))
        try:
            dt = slope_time(lambda: fit(coords_d, ys_d))
            model = fit(coords_d, ys_d)
            fitted = np.asarray(model.fitted, np.float64)
            lam = np.asarray(model.lam, np.float64)
        except Exception as e:
            print(f"{prec}/{term}: FAILED {type(e).__name__}: {str(e)[:150]}",
                  flush=True)
            results.append(dict(precision=prec, termination=term,
                                error=str(e)[:300]))
            continue
        gap = float(np.max(np.abs(fitted - ref_fitted) / y_scale))
        lam_logdiff = float(np.max(np.abs(np.log10(lam) - np.log10(ref_lam))))
        if control_gap is None:
            control_gap = gap
        print(f"{prec}/{term}: {dt*1e3:.1f} ms/solve, "
              f"max|fitted-f64|/sd(y) = {gap:.2e}, "
              f"max|log10 lam - f64| = {lam_logdiff:.3f}", flush=True)
        results.append(dict(
            precision=prec, termination=term, solve_ms=round(dt * 1e3, 2),
            fitted_gap_sd=gap, lam_logdiff=lam_logdiff,
        ))
    # restore defaults
    tps_mod._EIGH_PRECISION = "float32"
    tps_mod._EIGH_TERMINATION = 256
    out = dict(n=int(coords.shape[0]), control_gap_sd=control_gap,
               results=results)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "eigh_precision_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
