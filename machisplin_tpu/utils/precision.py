"""Full-f32 matmul precision for the statistical compute paths.

TPU's default matmul precision truncates f32 inputs to bfloat16 before
they enter the MXU.  That is the right trade for neural-net training, but
this library's matmuls carry *statistics* — kernel matrices, histogram
sums, QR/normal-equation factors, model coefficients — where silent ~1e-2
relative input error breaks the R-parity target (1e-5 in R^2, BASELINE)
and, in the worst case, the physics of the fit (the round-1 TPS
regression).  Decorating the fit/predict entry points pins every matmul
traced inside them (including within jit/vmap/scan and library calls like
eigh/QR) to HIGHEST precision, which XLA implements as exact-f32
multi-pass MXU.  The deliberately-bfloat16 indicator matmuls in the
forest predictors pass bf16 operands explicitly, which this flag leaves
untouched — 0/1 indicators are exact in bf16.

Trace-time semantics: jax's default_matmul_precision is part of the jit
cache key, so decorated and undecorated traces never share programs.
"""
from __future__ import annotations

import functools

import jax

__all__ = ["highest_precision"]


def highest_precision(fn):
    """Run ``fn`` (and everything it traces) at HIGHEST matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
