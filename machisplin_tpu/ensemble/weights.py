"""Ensemble weight selection.

The reference minimises the summed squared weight-normalised CV residual

    fit(k) = sum_i ( sum_a k_a * r_{a,i} / sum_a k_a )^2

over k in [0,1]^A by L-BFGS-B from k=0.5 (machisplin.optimx.internal,
V73:329-333 / 369-373), then keeps algorithms whose ROUNDED weight
round(k_a, 2) exceeds 5% of the UNROUNDED weight total (V73:337-362 — both
quirks preserved), assembling the letter string in the fixed order
b, g, n, m, r, v and per-algorithm percentages of the kept-weight total
(V73:408-428).

Two optimisers are provided:

* ``optimize_weights_lbfgsb`` — reference-faithful: scipy L-BFGS-B on the
  host (the problem is 4-6 dimensional; device round-trips would dominate).
* ``optimize_weights_sweep`` — TPU-idiomatic: the residual matrix is tiny
  (A x n), so score EVERY candidate weight vector on a quasi-random grid in
  one batched matmul and take the argmin, refined by a projected local
  search.  This is the batched-simplex sweep of BASELINE.json's north star
  and is what the multi-response batched path uses.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize

from ..models.base import LETTER_ORDER

from ..utils.precision import highest_precision


class WeightResult(NamedTuple):
    weights: np.ndarray        # (A,) raw optimised weights in [0, 1]
    letters: str               # kept algorithms, reference letter order
    kept_weights: np.ndarray   # rounded weights of kept algorithms
    weight_total: float        # UNROUNDED total over all algorithms (V73:337)
    percent_text: str          # "62.5:37.5"-style text (V73:408-428)
    objective: float


def ensemble_objective(weights, residuals):
    """fit(k) for weights (..., A) against residuals (A, n)."""
    weights = jnp.asarray(weights)
    residuals = jnp.asarray(residuals)
    total = jnp.sum(weights, axis=-1, keepdims=True)
    mix = (weights / jnp.maximum(total, 1e-12)) @ residuals
    return jnp.sum(mix * mix, axis=-1)


def _fmt_r(x: float) -> str:
    """round(x, 1) printed the way R prints it (no trailing '.0')."""
    s = f"{np.round(float(x), 1):.1f}"
    return s[:-2] if s.endswith(".0") else s


def _select(weights: np.ndarray, letters: Sequence[str], objective: float) -> WeightResult:
    weights = np.asarray(weights, np.float64)
    total = float(np.sum(weights))
    cut = 0.05 * total
    kept_letters = []
    kept = []
    for a, letter in enumerate(letters):
        if np.round(weights[a], 2) > cut:
            kept_letters.append(letter)
            kept.append(np.round(weights[a], 2))
    if not kept:  # pathological: keep the single best algorithm
        a = int(np.argmax(weights))
        kept_letters, kept = [letters[a]], [np.round(weights[a], 2)]
    kept = np.asarray(kept)
    # percentage text exactly as the reference assembles it (V73:408-428):
    # round(w / kept_total * 100, 1) joined by ":" — a single kept model
    # therefore prints "100"; the reference's `if (txt == 1) txt <- "none"`
    # remap (V73:429) only fires on the literal value 1, which the normal
    # flow never produces, so it is preserved verbatim rather than applied
    # to every single-model ensemble.
    pct = [_fmt_r(w / kept.sum() * 100) for w in kept]
    text = ":".join(pct)
    if text == "1":
        text = "none"
    return WeightResult(
        weights=weights,
        letters="".join(kept_letters),
        kept_weights=kept,
        weight_total=total,
        percent_text=text,
        objective=float(objective),
    )


@highest_precision
def optimize_weights_lbfgsb(residuals, letters: Sequence[str] = LETTER_ORDER) -> WeightResult:
    """Reference-faithful path: L-BFGS-B from 0.5 per weight (V73:327-333)."""
    res = np.asarray(residuals, np.float64)
    a = res.shape[0]

    def f(k):
        s = max(k.sum(), 1e-12)
        mix = (k / s) @ res
        return float(mix @ mix)

    def grad(k):
        s = max(k.sum(), 1e-12)
        mix = (k / s) @ res
        g_mix = 2.0 * res @ mix           # d fit / d (k/s)
        return (g_mix - (k / s) @ g_mix) / s

    out = minimize(
        f, np.full(a, 0.5), jac=grad, method="L-BFGS-B", bounds=[(0.0, 1.0)] * a
    )
    return _select(out.x, letters, out.fun)


@highest_precision
def optimize_weights_aicc(residuals, letters: Sequence[str] = LETTER_ORDER) -> WeightResult:
    """Historical V18 selection: enumerate every equal-weight subset of the
    algorithms and pick minimum AICc with parameter count = ensemble size
    (old/...V18.R:285-291, 360-366 — the design the V73 docstring still
    advertises, V73:8).  Exposed for parity/archaeology; the default path is
    the V73 continuous-weight search.

    All 2^A - 1 subsets are scored in ONE batched matmul — the TPU-shaped
    version of V18's loop."""
    res = jnp.asarray(residuals)
    a, n = res.shape
    masks = ((jnp.arange(1, 2**a)[:, None] >> jnp.arange(a)[None, :]) & 1).astype(res.dtype)
    rss = ensemble_objective(masks, res)                    # equal weights = mask/k
    k = jnp.sum(masks, axis=1)
    aicc = n * jnp.log(jnp.maximum(rss / n, 1e-300)) + 2 * k + (
        2 * k * (k + 1) / jnp.maximum(n - k - 1, 1.0)
    )
    best = masks[jnp.argmin(aicc)]
    weights = np.asarray(best, np.float64)
    kept = [letters[i] for i in range(a) if weights[i] > 0]
    kw = weights[weights > 0]
    pct = [_fmt_r(100.0 / len(kw)) for _ in kw]
    return WeightResult(
        weights=weights,
        letters="".join(kept),
        kept_weights=kw,
        weight_total=float(weights.sum()),
        percent_text=":".join(pct),
        objective=float(rss[jnp.argmin(aicc)]),
    )


@highest_precision
def optimize_weights_sweep(
    residuals,
    letters: Sequence[str] = LETTER_ORDER,
    n_candidates: int = 4096,
    refine_steps: int = 200,
    key=None,
) -> WeightResult:
    """TPU path: batched candidate sweep + projected gradient refinement."""
    res = jnp.asarray(residuals)
    a = res.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    k0, k1 = jax.random.split(key)
    cands = jax.random.uniform(k0, (n_candidates, a), res.dtype)
    cands = jnp.concatenate([cands, jnp.full((1, a), 0.5, res.dtype)], axis=0)
    scores = ensemble_objective(cands, res)          # one batched matmul
    best = cands[jnp.argmin(scores)]

    # derivative-free local zoom: batched Gaussian perturbations with a
    # shrinking radius — every iteration is one (batch, A) @ (A, n) matmul
    n_local = 256

    def zoom(carry, inp):
        best, best_val = carry
        kk, sigma = inp
        local = jnp.clip(
            best[None, :] + sigma * jax.random.normal(kk, (n_local, a), res.dtype),
            0.0, 1.0,
        )
        vals = ensemble_objective(local, res)
        i = jnp.argmin(vals)
        better = vals[i] < best_val
        return (
            jnp.where(better, local[i], best),
            jnp.where(better, vals[i], best_val),
        ), None

    n_zoom = max(refine_steps // 10, 12)
    sigmas = 0.3 * 0.7 ** jnp.arange(n_zoom, dtype=res.dtype)
    keys = jax.random.split(k1, n_zoom)
    (best, best_val), _ = jax.lax.scan(
        zoom, (best, ensemble_objective(best, res)), (keys, sigmas)
    )
    return _select(np.asarray(best), letters, float(best_val))
