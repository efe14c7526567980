"""'GAM' model — ordinary least squares.

The reference calls ``mgcv::gam(resp ~ covar1+...+LONG+LAT)`` with **no s()
smooth terms** (formula built at V73:195, fit at V73:252/600), so its "GAM"
degenerates to a plain linear model.  We implement exactly that; variable
importance is the coefficient vector, mirroring ``mod.GAM$coefficients``
(V73:602).
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


@highest_precision
def fit(key, x, y, *, sample_weight=None, ridge: float = 1e-8) -> GAMState:
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
def predict(state: GAMState, x) -> jax.Array:
    x = jnp.asarray(x)
    xs = (x - state.x_mean) / state.x_scale
    return state.coef[0] + xs @ state.coef[1:]


def importance(state: GAMState, names) -> dict:
    """Raw-scale coefficients keyed by term, like mgcv's coefficient report."""
    raw = state.coef[1:] / state.x_scale
    intercept = state.coef[0] - jnp.sum(raw * state.x_mean)
    out = {"(Intercept)": float(intercept)}
    for n, c in zip(names, raw):
        out[n] = float(c)
    return out
