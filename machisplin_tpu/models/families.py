"""gbm loss families: gaussian, laplace, poisson, bernoulli.

The reference's vendored gbm.step driver accepts all four families
(V73:1673 ``family`` argument; deviance formulas V73:2250-2284) and hands
the actual boosting to the C++ ``gbm::gbm`` engine.  This module is the
TPU-native equivalent of that engine's per-family pieces:

* ``f0_init``        — the intercept-only fit on the link scale;
* ``gradient``       — the working response a tree is grown on (gbm grows
                       least-squares trees on the negative gradient for
                       every family);
* ``leaf_adjust``    — the terminal-node estimate replacing the raw
                       least-squares leaf mean (Newton step for bernoulli,
                       log-ratio for poisson, node median for laplace);
* ``response``       — inverse link from the boosted score to the response
                       scale (the exp/logistic transforms the driver applies
                       by hand, V73:1837-1851).

Everything is shape-static and jits; ``family`` is a static Python string.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["FAMILIES", "f0_init", "gradient", "leaf_adjust", "response"]

FAMILIES = ("gaussian", "laplace", "poisson", "bernoulli")

_EPS = 1e-12
# gbm clamps poisson node estimates to +-19 on the log scale
_POISSON_CAP = 19.0


def _check(family: str) -> str:
    family = family.lower()
    if family in ("binomial",):
        family = "bernoulli"
    if family not in FAMILIES:
        raise ValueError(f"unknown family {family!r}; expected one of {FAMILIES}")
    return family


def _masked_median(vals, active):
    """Median of ``vals`` over rows where ``active`` > 0 (NaN-free inputs)."""
    big = jnp.asarray(jnp.finfo(vals.dtype).max, vals.dtype)
    n = vals.shape[-1]
    v = jnp.sort(jnp.where(active > 0, vals, big), axis=-1)
    cnt = jnp.sum((active > 0).astype(jnp.int32), axis=-1)
    hi = jnp.clip((cnt - 1) // 2 + (cnt % 2 == 0), 0, n - 1)
    lo = jnp.clip((cnt - 1) // 2, 0, n - 1)
    med = 0.5 * (
        jnp.take_along_axis(v, lo[..., None], axis=-1)[..., 0]
        + jnp.take_along_axis(v, hi[..., None], axis=-1)[..., 0]
    )
    return jnp.where(cnt > 0, med, 0.0)


def f0_init(y, w, family: str, offset=None):
    """Intercept-only fit on the link scale (gbm's initF).

    ``offset`` (gbm's per-row fixed term on the link scale, V73:1664/1774):
    the intercept solves the weighted score equation GIVEN the offset —
    mean/median of ``y - offset`` for gaussian/laplace, the log-ratio
    ``log(Σwy / Σw·exp(offset))`` for poisson, and a Newton solve of
    ``Σw(y − σ(f0+offset)) = 0`` for bernoulli (gbm's C++ initF forms).
    """
    family = _check(family)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    ybar = jnp.sum(w * y) / wsum
    if offset is None:
        if family == "gaussian":
            return ybar
        if family == "laplace":
            return _masked_median(y, w)
        if family == "poisson":
            return jnp.log(jnp.maximum(ybar, _EPS))
        # bernoulli: logit of the weighted prevalence
        p = jnp.clip(ybar, _EPS, 1 - _EPS)
        return jnp.log(p / (1 - p))
    if family == "gaussian":
        return jnp.sum(w * (y - offset)) / wsum
    if family == "laplace":
        return _masked_median(y - offset, w)
    if family == "poisson":
        num = jnp.maximum(jnp.sum(w * y), _EPS)
        den = jnp.maximum(jnp.sum(w * jnp.exp(offset)), _EPS)
        return jnp.log(num / den)
    # bernoulli: Newton iterations (statically unrolled, jittable)
    p0 = jnp.clip(ybar, _EPS, 1 - _EPS)
    f0 = jnp.log(p0 / (1 - p0))
    for _ in range(25):
        p = 1.0 / (1.0 + jnp.exp(-(f0 + offset)))
        num = jnp.sum(w * (y - p))
        den = jnp.maximum(jnp.sum(w * p * (1.0 - p)), _EPS)
        f0 = f0 + num / den
    return f0


def gradient(y, f, family: str):
    """Negative gradient of the deviance wrt f — the tree's working response."""
    family = _check(family)
    if family == "gaussian":
        return y - f
    if family == "laplace":
        return jnp.sign(y - f)
    if family == "poisson":
        return y - jnp.exp(f)
    return y - 1.0 / (1.0 + jnp.exp(-f))       # bernoulli: y - p


def response(f, family: str):
    """Inverse link (the driver's manual exp/logistic, V73:1837-1851)."""
    family = _check(family)
    if family in ("gaussian", "laplace"):
        return f
    if family == "poisson":
        return jnp.exp(f)
    return 1.0 / (1.0 + jnp.exp(-f))


def leaf_adjust(values, cur, n_total: int, y, f, w, family: str):
    """Family-correct terminal-node estimates.

    values: (n_total,) raw least-squares leaf means of the gradient (what the
            grower produced) — returned unchanged for gaussian;
    cur:    (n,) final node assignment of every training row;
    y, f:   response and current score;  w: in-bag weights (0 = unused row).

    Node statistics come from one-hot matmuls (no scatters), matching the
    grower's histogram style.
    """
    family = _check(family)
    if family == "gaussian":
        return values
    node1h = (cur[:, None] == jnp.arange(n_total)[None, :]).astype(w.dtype)  # (n, N)
    if family == "laplace":
        # gbm: node estimate = median of residuals in the node
        resid = y - f
        active = node1h * (w > 0)[:, None]              # (n, N)
        med = _masked_median(resid[None, :].repeat(n_total, 0), active.T)
        return med
    if family == "poisson":
        num = node1h.T @ (w * y)
        den = node1h.T @ (w * jnp.exp(f))
        val = jnp.log(jnp.maximum(num, _EPS) / jnp.maximum(den, _EPS))
        return jnp.clip(jnp.where(den > 0, val, 0.0), -_POISSON_CAP, _POISSON_CAP)
    # bernoulli: one Newton step  sum w*(y-p) / sum w*p*(1-p)
    p = 1.0 / (1.0 + jnp.exp(-f))
    num = node1h.T @ (w * (y - p))
    den = node1h.T @ (w * p * (1.0 - p))
    return jnp.where(den > _EPS, num / jnp.maximum(den, _EPS), 0.0)
