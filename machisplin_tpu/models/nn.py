"""Neural-network model — single-hidden-layer MLP, linear output.

Mirrors the reference's ``nnet::nnet(form, data, size=10, linout=TRUE,
maxit=10000)`` (V73:249 CV / V73:463 final): 10 logistic hidden units, linear
output, full-batch quasi-Newton training.  The response is min-shifted and
max-scaled to [0, 1] by the *pipeline* exactly as the reference does
(V73:234-241 / 454-459); this module trains on whatever y it is given.

TPU-native choices: inputs are standardised internally (nnet trains on raw
covariates, which with kilometre-scale magnitudes mostly saturates its
sigmoids; standardisation is strictly better and changes nothing about the
API), and the optimiser is optax L-BFGS with backtracking line search run
full-batch under jit — vmappable across CV folds.

Variable importance is Garson's algorithm, matching
``NeuralNetTools::garson`` (V73:465).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from .base import as_weight

from ..utils.precision import highest_precision


class NNState(NamedTuple):
    w1: jax.Array        # (p, h)
    b1: jax.Array        # (h,)
    w2: jax.Array        # (h,)
    b2: jax.Array        # ()
    x_mean: jax.Array    # (p,)
    x_scale: jax.Array   # (p,)


def _forward(params, xs):
    w1, b1, w2, b2 = params
    hidden = jax.nn.sigmoid(xs @ w1 + b1)
    return hidden @ w2 + b2


@highest_precision
def fit(
    key,
    x,
    y,
    *,
    sample_weight=None,
    hidden: int = 10,
    maxit: int = 10000,
    init_range: float = 0.7,
    decay: float = 0.0,
) -> NNState:
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

    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = (
        jax.random.uniform(k1, (p, hidden), x.dtype, -init_range, init_range),
        jax.random.uniform(k2, (hidden,), x.dtype, -init_range, init_range),
        jax.random.uniform(k3, (hidden,), x.dtype, -init_range, init_range),
        jax.random.uniform(k4, (), x.dtype, -init_range, init_range),
    )

    def loss_fn(params):
        pred = _forward(params, xs)
        mse = jnp.sum(w * (pred - y) ** 2) / wsum
        l2 = sum(jnp.sum(q * q) for q in params[:3]) + params[3] ** 2
        return mse + decay * l2

    opt = optax.lbfgs(memory_size=20)
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    # Why a FIXED-length scan and not nnet's reltol convergence stop: the
    # zoom linesearch yields exactly-zero updates once converged, so the
    # scan's tail iterations are no-ops and the result is bit-identical to
    # a reltol=1e-8 while_loop stop (measured: 0.0 prediction diff, loop
    # exits at ~2.7k of 10000 steps on the bundled data).  The while_loop
    # variant was MEASURED SLOWER on both backends (TPU vmapped CV 7.1 s
    # vs 5.4 s; XLA schedules scan tighter than while), so the cap stays a
    # scan.  ``maxit`` mirrors nnet's cap semantics (V73:249) and
    # test_nn_maxit_plateaus_by_default pins that the default is past the
    # L-BFGS plateau.
    def step(carry, _):
        params, state = carry
        value, grad = value_and_grad(params, state=state)
        updates, state = opt.update(
            grad, state, params, value=value, grad=grad, value_fn=loss_fn
        )
        params = optax.apply_updates(params, updates)
        return (params, state), value

    (params, _), _ = jax.lax.scan(step, (params, opt.init(params)), None, length=maxit)
    w1, b1, w2, b2 = params
    return NNState(w1=w1, b1=b1, w2=w2, b2=b2, x_mean=x_mean, x_scale=x_scale)


@highest_precision
def fit_carry_init(key, x, y, *, sample_weight=None, hidden: int = 10,
                   init_range: float = 0.7):
    """Initial carry for SEGMENTED fitting: (params, opt_state, x_mean,
    x_scale).  Segmenting exists so one device program never holds the
    whole ``maxit`` loop — at config-3 scale (10k rows x 64-wide vmap x
    10000 L-BFGS steps) the single-dispatch form runs minutes on-device
    and risks the pool watchdog; run_cv advances the carry in bounded
    ``fit_carry_steps`` dispatches instead.  The step sequence is
    IDENTICAL to ``fit``'s scan, so segmented == single-dispatch."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n, p = x.shape
    w = as_weight(sample_weight, n, x.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    x_mean = jnp.sum(x * w[:, None], axis=0) / wsum
    xc = x - x_mean
    x_scale = jnp.sqrt(jnp.sum(w[:, None] * xc * xc, axis=0) / wsum)
    x_scale = jnp.where(x_scale > 0, x_scale, 1.0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = (
        jax.random.uniform(k1, (p, hidden), x.dtype, -init_range, init_range),
        jax.random.uniform(k2, (hidden,), x.dtype, -init_range, init_range),
        jax.random.uniform(k3, (hidden,), x.dtype, -init_range, init_range),
        jax.random.uniform(k4, (), x.dtype, -init_range, init_range),
    )
    opt = optax.lbfgs(memory_size=20)
    return params, opt.init(params), x_mean, x_scale


@highest_precision
def fit_carry_steps(carry, x, y, *, sample_weight=None, steps: int,
                    decay: float = 0.0):
    """Advance the L-BFGS loop ``steps`` iterations (jit/vmap-able).  Same
    update sequence as ``fit``; the standardisation is recomputed from the
    carried moments (cheap) so only the small carry crosses dispatches."""
    params, state, x_mean, x_scale = carry
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n, p = x.shape
    w = as_weight(sample_weight, n, x.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    xs = (x - x_mean) / x_scale

    def loss_fn(params):
        pred = _forward(params, xs)
        mse = jnp.sum(w * (pred - y) ** 2) / wsum
        l2 = sum(jnp.sum(q * q) for q in params[:3]) + params[3] ** 2
        return mse + decay * l2

    opt = optax.lbfgs(memory_size=20)
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    def step(carry, _):
        params, state = carry
        value, grad = value_and_grad(params, state=state)
        updates, state = opt.update(
            grad, state, params, value=value, grad=grad, value_fn=loss_fn
        )
        params = optax.apply_updates(params, updates)
        return (params, state), None

    (params, state), _ = jax.lax.scan(step, (params, state), None, length=steps)
    return params, state, x_mean, x_scale


def carry_to_state(carry) -> NNState:
    params, _, x_mean, x_scale = carry
    w1, b1, w2, b2 = params
    return NNState(w1=w1, b1=b1, w2=w2, b2=b2, x_mean=x_mean, x_scale=x_scale)


@highest_precision
def predict(state: NNState, x) -> jax.Array:
    xs = (jnp.asarray(x) - state.x_mean) / state.x_scale
    return _forward((state.w1, state.b1, state.w2, state.b2), xs)


def importance(state: NNState, names) -> dict:
    """Garson relative importance from |input-hidden| x |hidden-output| weights
    (NeuralNetTools::garson semantics, V73:465); sums to 1."""
    contrib = jnp.abs(state.w1) * jnp.abs(state.w2)[None, :]   # (p, h)
    share = contrib / jnp.maximum(jnp.sum(contrib, axis=0, keepdims=True), 1e-12)
    rel = jnp.sum(share, axis=1)
    rel = rel / jnp.maximum(jnp.sum(rel), 1e-12)
    return {n: float(v) for n, v in zip(names, rel)}
