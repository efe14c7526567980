"""Deviance calculations — machisplin.calc.deviance equivalent (V73:2250-2284).

Families as in the vendored gbm.step driver: bernoulli (binomial), poisson,
laplace, gaussian (= weighted RSS).  ``calc_mean=True`` returns the
weight-normalised mean deviance, matching the driver's usage in its holdout
curves.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["calc_deviance"]


def calc_deviance(obs, pred, weights=None, family: str = "gaussian", calc_mean: bool = True):
    obs = jnp.asarray(obs)
    pred = jnp.asarray(pred)
    if weights is None:
        weights = jnp.ones_like(obs)
    else:
        weights = jnp.asarray(weights, obs.dtype)

    eps = 1e-12
    if family == "gaussian":
        dev = (obs - pred) ** 2
    elif family == "bernoulli":
        p = jnp.clip(pred, eps, 1 - eps)
        dev = -2.0 * (obs * jnp.log(p) + (1 - obs) * jnp.log(1 - p))
    elif family == "poisson":
        mu = jnp.maximum(pred, eps)
        term = jnp.where(obs > 0, obs * jnp.log(jnp.maximum(obs, eps) / mu), 0.0)
        dev = 2.0 * (term - (obs - mu))
    elif family == "laplace":
        dev = jnp.abs(obs - pred)
    else:
        raise ValueError(f"unknown family {family!r}")

    total = jnp.sum(dev * weights)
    if calc_mean:
        return total / jnp.maximum(jnp.sum(weights), eps)
    return total
