"""'GAM' model — ordinary least squares, plus optional true smooths.

The reference calls ``mgcv::gam(resp ~ covar1+...+LONG+LAT)`` with **no s()
smooth terms** (formula built at V73:195, fit at V73:252/600), so its "GAM"
degenerates to a plain linear model.  ``fit`` implements exactly that by
default; variable importance is the coefficient vector, mirroring
``mod.GAM$coefficients`` (V73:602).

``fit(..., smooth=True)`` is the framework extension SURVEY.md §7 suggests
("optionally true GAM"): an additive model with a penalized P-spline term
per covariate (cubic B-spline basis on ``k`` quantile knots + second-order
difference penalty, Eilers–Marx), the linear null space kept explicit, and
a shared smoothing parameter selected by GCV over a log grid — a simplified
analog of ``mgcv::gam(resp ~ s(covar1) + ...)``.  Everything is dense jnp:
one (q x q) penalized normal-equations solve per lambda with q = 1 + p(k+1)
parameters, so it jits and vmaps like the other models.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import as_weight

from ..utils.precision import highest_precision


class GAMState(NamedTuple):
    coef: jax.Array       # (p + 1,) [intercept, covariates...]
    x_mean: jax.Array     # (p,) centering used for conditioning
    x_scale: jax.Array    # (p,)


class GAMSmoothState(NamedTuple):
    """Additive P-spline model: intercept + per-feature linear + spline."""

    coef: jax.Array       # (1 + p + p*k,) [intercept, linear..., spline...]
    knots: jax.Array      # (p, k + 4) padded B-spline knot vectors (scaled x)
    centers: jax.Array    # (p, k) training-time spline-block column means
    x_mean: jax.Array     # (p,)
    x_scale: jax.Array    # (p,)
    lam: jax.Array        # () GCV-selected smoothing parameter
    gcv: jax.Array        # () minimised GCV score
    eff_df: jax.Array     # () tr(A)
    k: int                # spline basis size per feature


def _bspline_basis(xs, knots):
    """Cubic B-spline design for one feature.

    xs: (n,) standardized values; knots: (k + 4,) padded knot vector
    (k-4 interior quantile knots with 4-fold boundary padding).
    Returns (n, k) via the Cox–de Boor recursion (dense, jit-friendly).
    """
    t = knots
    m = t.shape[0]
    # order 1 indicators: B_j^1(x) = [t_j <= x < t_{j+1}] (last interval closed)
    x = xs[:, None]
    left = t[None, :-1]
    right = t[None, 1:]
    b = ((x >= left) & (x < right)).astype(xs.dtype)       # (n, m-1)
    last = jnp.argmax(jnp.where(t[1:] > t[:-1], jnp.arange(m - 1), -1))
    b = b.at[:, last].set(jnp.where(xs >= t[last], 1.0, b[:, last]))
    for order in range(2, 5):                              # orders 2..4 (cubic)
        tl = t[: m - order]
        tr = t[order:]
        denom1 = jnp.maximum(t[order - 1 : m - 1] - tl, 1e-12)
        denom2 = jnp.maximum(tr - t[1 : m - order + 1], 1e-12)
        w1 = (x - tl[None, :]) / denom1[None, :]
        w2 = (tr[None, :] - x) / denom2[None, :]
        b = w1 * b[:, : m - order] + w2 * b[:, 1 : m - order + 1]
    return b                                               # (n, m-4)


def _smooth_design(xs, knots, p, k, centers=None):
    """Full design [1, linear..., splines...] for standardized (n, p) xs.

    Each spline block is centered (no intercept overlap) using the TRAINING
    column means: pass ``centers=None`` at fit (computed and returned) and
    the stored (p, k) centers at predict.
    """
    n = xs.shape[0]
    cols = [jnp.ones((n, 1), xs.dtype), xs]
    cents = []
    for f in range(p):
        bf = _bspline_basis(xs[:, f], knots[f])
        c = jnp.mean(bf, axis=0) if centers is None else centers[f]
        cents.append(c)
        cols.append(bf - c[None, :])
    return jnp.concatenate(cols, axis=1), jnp.stack(cents)  # (n, q), (p, k)


@highest_precision
def fit(key, x, y, *, sample_weight=None, ridge: float = 1e-8,
        smooth: bool = False, k: int = 10, ngrid: int = 40):
    """OLS by default (the reference's degenerate no-s() GAM); with
    ``smooth=True``, the penalized additive P-spline extension."""
    if smooth:
        return fit_smooth(key, x, y, sample_weight=sample_weight, k=k, ngrid=ngrid)
    del key
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    w = as_weight(sample_weight, x.shape[0], x.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    x_mean = jnp.sum(x * w[:, None], axis=0) / wsum
    xc = x - x_mean
    x_scale = jnp.sqrt(jnp.sum(w[:, None] * xc * xc, axis=0) / wsum)
    x_scale = jnp.where(x_scale > 0, x_scale, 1.0)
    xs = xc / x_scale
    z = jnp.concatenate([jnp.ones_like(y)[:, None], xs], axis=1)
    zw = z * w[:, None]
    g = z.T @ zw + ridge * jnp.eye(z.shape[1], dtype=x.dtype)
    b = zw.T @ y
    coef = jnp.linalg.solve(g, b)
    return GAMState(coef=coef, x_mean=x_mean, x_scale=x_scale)


@highest_precision
def fit_smooth(key, x, y, *, sample_weight=None, k: int = 10,
               ngrid: int = 40) -> GAMSmoothState:
    """Additive penalized P-spline GAM with shared GCV-selected lambda."""
    del key
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n, p = x.shape
    w = as_weight(sample_weight, n, x.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    x_mean = jnp.sum(x * w[:, None], axis=0) / wsum
    xc = x - x_mean
    x_scale = jnp.sqrt(jnp.sum(w[:, None] * xc * xc, axis=0) / wsum)
    x_scale = jnp.where(x_scale > 0, x_scale, 1.0)
    xs = xc / x_scale

    # per-feature padded knot vectors: 4-fold boundary + k-4 interior
    # quantiles, all from the ACTIVE (w > 0) rows only — knot placement from
    # held-out rows would leak covariate information into CV folds, and the
    # weighted mean/scale just above already exclude them
    active = (w > 0)[:, None]
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    lo = jnp.min(jnp.where(active, xs, big), axis=0) - 1e-3
    hi = jnp.max(jnp.where(active, xs, -big), axis=0) + 1e-3
    from .trees import make_bins_masked

    # quantiles linspace(0,1,k-2)[1:-1] over the active rows == the masked
    # bin-edge helper at n_bins = k-3
    interior = make_bins_masked(xs, w, k - 3)              # (p, k-4)
    knots = jnp.concatenate(
        [jnp.repeat(lo[:, None], 4, axis=1), interior,
         jnp.repeat(hi[:, None], 4, axis=1)], axis=1,
    )                                                      # (p, k+4)

    z, centers = _smooth_design(xs, knots, p, k)           # (n, q)
    q = z.shape[1]
    # block-diagonal 2nd-difference penalty over each spline block
    eye = jnp.eye(k, dtype=x.dtype)
    d = (
        eye[:-2]
        - 2 * jnp.eye(k, k=1, dtype=x.dtype)[:-2]
        + jnp.eye(k, k=2, dtype=x.dtype)[:-2]
    )
    s_block = d.T @ d                                      # (k, k)
    s_pen = jnp.zeros((q, q), x.dtype)
    for f in range(p):
        i0 = 1 + p + f * k
        s_pen = s_pen.at[i0 : i0 + k, i0 : i0 + k].set(s_block)

    zw = z * w[:, None]
    g = z.T @ zw                                           # (q, q)
    b = zw.T @ y
    yy = jnp.sum(w * y * y)
    n_a = jnp.sum((w > 0).astype(x.dtype))

    def gcv_of(lam):
        m = g + lam * s_pen + 1e-8 * jnp.eye(q, dtype=x.dtype)
        coef = jnp.linalg.solve(m, b)
        rss = yy - 2 * coef @ b + coef @ (g @ coef)
        tr_a = jnp.trace(jnp.linalg.solve(m, g))
        return n_a * jnp.maximum(rss, 0.0) / jnp.maximum(n_a - tr_a, 1.0) ** 2, coef, tr_a

    grid = jnp.logspace(-6, 6, ngrid, dtype=x.dtype)
    scores = jax.vmap(lambda l: gcv_of(l)[0])(grid)
    lam = grid[jnp.argmin(scores)]
    gcv, coef, tr_a = gcv_of(lam)
    return GAMSmoothState(
        coef=coef, knots=knots, centers=centers, x_mean=x_mean, x_scale=x_scale,
        lam=lam, gcv=gcv, eff_df=tr_a, k=k,
    )


@highest_precision
def predict(state, x) -> jax.Array:
    x = jnp.asarray(x)
    xs = (x - state.x_mean) / state.x_scale
    if isinstance(state, GAMSmoothState):
        p = xs.shape[1]
        xs = jnp.clip(xs, state.knots[:, 0][None, :], state.knots[:, -1][None, :])
        z, _ = _smooth_design(xs, state.knots, p, state.k, centers=state.centers)
        return z @ state.coef
    return state.coef[0] + xs @ state.coef[1:]


def importance(state, names) -> dict:
    """Raw-scale coefficients keyed by term, like mgcv's coefficient report.

    For a smooth fit, each term reports its linear slope plus the L2
    magnitude of its spline coefficients (an s(x)-wiggliness indicator)."""
    if isinstance(state, GAMSmoothState):
        p = len(names)
        lin = state.coef[1 : 1 + p] / state.x_scale
        out = {"(Intercept)": float(state.coef[0]),
               "edf": float(state.eff_df), "lambda": float(state.lam)}
        for f, n in enumerate(names):
            spl = state.coef[1 + p + f * state.k : 1 + p + (f + 1) * state.k]
            out[n] = {"linear": float(lin[f]),
                      "s_norm": float(jnp.linalg.norm(spl))}
        return out
    raw = state.coef[1:] / state.x_scale
    intercept = state.coef[0] - jnp.sum(raw * state.x_mean)
    out = {"(Intercept)": float(intercept)}
    for n, c in zip(names, raw):
        out[n] = float(c)
    return out
