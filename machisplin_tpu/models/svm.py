"""SVM model — epsilon-SVR with an RBF kernel.

Mirrors the reference's ``kernlab::ksvm(form, data)`` defaults (V73:251 CV,
V73:560 final): eps-SVR, C = 1, epsilon = 0.1, Gaussian kernel
k(x,z) = exp(-sigma * |x-z|^2) with sigma picked by kernlab's ``sigest``
heuristic (quantiles of pairwise squared distances), and inputs/response
standardised (ksvm ``scaled=TRUE``).

Solver: the exact SVR dual in theta = alpha - alpha*,

    min_theta  1/2 theta' K theta - y' theta + eps |theta|_1 ,
    |theta_i| <= C,   sum_i theta_i = 0,

is solved to its true KKT point (the same optimum kernlab's SMO reaches) by
an augmented-Lagrangian treatment of the equality constraint: cyclic
soft-threshold coordinate descent on K + mu*11' with a multiplier update
lambda <- lambda + mu * sum(theta) each sweep.  At the optimum the
multiplier IS the bias b (stationarity  K theta - y + eps*sgn + lambda*1 = 0
matches the primal KKT with b = lambda); the final bias is refined from the
free support vectors exactly as libsvm/kernlab do
(b = mean over 0<|theta_i|<C of  y_i - (K theta)_i - eps*sign(theta_i)).
Everything is fixed-shape under ``lax.scan`` so the whole fit jits and vmaps
across CV folds.  K stays resident per fit; the CALLERS bound the total:
run_cv gathers the ~n/k active rows per inverted fold and widths its vmap
by the (n, n) footprint, the final-fit batcher chunks its response axis,
and ``predict`` chunks large query batches internally (round 5 — the
19-response x 10k-station shape crashed the TPU worker before these).

Variable importance is computed by the pipeline via the breakDown-style
sampled contribution report (ensemble/importance.py), matching V73:562-580.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import as_weight

from ..utils.precision import highest_precision


class SVMState(NamedTuple):
    sv_x: jax.Array       # (n, p) standardised training inputs
    theta: jax.Array      # (n,) dual coefficients (0 for non-SVs and masked rows)
    bias: jax.Array       # ()
    sigma: jax.Array      # () RBF inverse width
    x_mean: jax.Array
    x_scale: jax.Array
    y_mean: jax.Array
    y_scale: jax.Array


def _rbf(a, b, sigma):
    # explicit per-feature differences — the repo's precision doctrine bans
    # the |a|^2+|b|^2-2ab' expansion (catastrophic cancellation at small r;
    # see ops/tps.py and CLAUDE.md).  Accumulating feature-by-feature keeps
    # the peak intermediate at one (m, n) panel instead of (m, n, p).
    r2 = jnp.zeros((a.shape[0], b.shape[0]), a.dtype)
    for f in range(a.shape[1]):
        d = a[:, f][:, None] - b[None, :, f]
        r2 = r2 + d * d
    return jnp.exp(-sigma * r2)


def _sigest(xs, w, key):
    """kernlab sigest: sigma bounds from the 0.1/0.9 quantiles of |x-z|^2 over
    a random sample of pairs; kernlab uses the mean of the two bounds."""
    n = xs.shape[0]
    m = min(2 * n, 2000)
    i = jax.random.randint(key, (m,), 0, n)
    j = jax.random.randint(jax.random.fold_in(key, 1), (m,), 0, n)
    valid = (w[i] > 0) & (w[j] > 0) & (i != j)
    d2 = jnp.sum((xs[i] - xs[j]) ** 2, axis=1)
    d2 = jnp.where(valid, d2, jnp.nan)
    q = jnp.nanquantile(d2, jnp.asarray([0.9, 0.1], xs.dtype))
    inv = 1.0 / jnp.maximum(q, 1e-12)
    return jnp.mean(inv)


@highest_precision
def fit(
    key,
    x,
    y,
    *,
    sample_weight=None,
    c_reg: float = 1.0,
    epsilon: float = 0.1,
    sigma: float | None = None,
    epochs: int = 120,
) -> SVMState:
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n, p = x.shape
    w = as_weight(sample_weight, n, x.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1.0)

    x_mean = jnp.sum(x * w[:, None], axis=0) / wsum
    xc = x - x_mean
    x_scale = jnp.sqrt(jnp.sum(w[:, None] * xc * xc, axis=0) / (wsum - 1.0))
    x_scale = jnp.where(x_scale > 0, x_scale, 1.0)
    xs = xc / x_scale
    y_mean = jnp.sum(y * w) / wsum
    y_scale = jnp.sqrt(jnp.sum(w * (y - y_mean) ** 2) / (wsum - 1.0))
    y_scale = jnp.where(y_scale > 0, y_scale, 1.0)
    ys = (y - y_mean) / y_scale

    if sigma is None:
        sig = _sigest(xs, w, key)
    else:
        sig = jnp.asarray(sigma, x.dtype)

    q = _rbf(xs, xs, sig)
    q = q * jnp.outer(w, w)                # masked rows decouple entirely
    q = q + jnp.diag(1.0 - w)
    mu = jnp.asarray(1.0, x.dtype)         # augmented-Lagrangian weight
    diag = jnp.diag(q) + mu * w            # A_ii of A = K + mu*11' (active rows)

    def sweep(carry, _):
        theta, s, lam = carry              # s = sum(theta), lam -> bias

        def coord(i, ts):
            theta, s = ts
            # others' contribution under A = K + mu*11'
            r_i = q[i] @ theta + mu * s * w[i] - diag[i] * theta[i]
            z = (ys[i] - lam) * w[i] - r_i
            cand = jnp.sign(z) * jnp.maximum(jnp.abs(z) - epsilon * w[i], 0.0)
            cand = jnp.clip(cand / jnp.maximum(diag[i], 1e-12), -c_reg, c_reg) * w[i]
            s = s + cand - theta[i]
            return theta.at[i].set(cand), s

        theta, s = jax.lax.fori_loop(0, n, coord, (theta, s))
        lam = lam + mu * s                 # multiplier step toward sum(theta)=0
        return (theta, s, lam), None

    zero = jnp.zeros((), x.dtype)
    (theta, _, lam), _ = jax.lax.scan(
        sweep, (jnp.zeros((n,), x.dtype), zero, zero), None, length=epochs
    )
    # bias from the free support vectors' KKT conditions (libsvm/kernlab);
    # the converged multiplier lam is the fallback when none are strictly free
    free = (jnp.abs(theta) > 1e-6) & (jnp.abs(theta) < 0.999 * c_reg) & (w > 0)
    b_i = ys - q @ theta - epsilon * jnp.sign(theta)
    n_free = jnp.sum(free)
    bias = jnp.where(n_free > 0, jnp.sum(jnp.where(free, b_i, 0.0)) / jnp.maximum(n_free, 1), lam)
    return SVMState(
        sv_x=xs, theta=theta, bias=bias, sigma=sig,
        x_mean=x_mean, x_scale=x_scale, y_mean=y_mean, y_scale=y_scale,
    )


@highest_precision
def predict(state: SVMState, x, query_block: int = 0) -> jax.Array:
    """SVR decision function at ``x``.

    Large query batches are processed in ``query_block``-row chunks under
    one ``lax.map`` so the (m, n_sv) kernel panel stays bounded (~64 MB by
    default) — at config-3 scale (10k SVs, 1M-cell raster blocks, 19
    responses vmapped) the unchunked panel alone is tens of GB (the
    round-5 TPU worker crash)."""
    xs = (jnp.asarray(x) - state.x_mean) / state.x_scale
    m = xs.shape[0]
    n_sv = state.sv_x.shape[0]

    def direct(q):
        k = _rbf(q, state.sv_x, state.sigma)
        f = k @ state.theta + state.bias
        return f * state.y_scale + state.y_mean

    if query_block <= 0:
        query_block = max(128, int(16e6) // max(n_sv, 1))
    if m <= query_block:
        return direct(xs)
    pad = (-m) % query_block
    xp = jnp.concatenate([xs, jnp.zeros((pad, xs.shape[1]), xs.dtype)])
    out = jax.lax.map(direct, xp.reshape(-1, query_block, xs.shape[1]))
    return out.reshape(-1)[:m]
