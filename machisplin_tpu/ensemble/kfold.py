"""k-fold assignment with the reference's semantics (machisplin.kfold,
V73:1553-1609): near-equal group sizes via rounded cut points, assignment
shuffled by a random permutation, optional stratification ``by`` groups, and
an error when there are fewer records than folds."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def kfold(key, n: int, k: int = 5, by=None) -> jax.Array:
    """Fold id in [0, k) per row (the reference uses 1..k; zero-based here)."""
    if by is not None:
        by = np.asarray(by)
        if by.shape[0] != n:
            raise ValueError("by must have one entry per row")
        out = np.zeros(n, np.int32)
        for i, u in enumerate(np.unique(by)):
            idx = np.where(by == u)[0]
            kk = min(len(idx), k)
            sub = kfold(jax.random.fold_in(key, i), len(idx), kk)
            out[idx] = np.asarray(sub)
        return jnp.asarray(out)

    if k == 1:
        return jnp.zeros((n,), jnp.int32)
    if n / k < 1:
        raise ValueError(f"insufficient records: {n}, with k={k}")
    # rounded cut points -> group sizes (V73:1563-1564)
    cuts = np.round(np.concatenate([[0.0], n / k * np.arange(1, k), [float(n)]]))
    times = np.diff(cuts).astype(int)
    group = np.repeat(np.arange(k, dtype=np.int32), times)
    perm = jax.random.permutation(key, n)
    return jnp.asarray(group)[perm]


def fold_masks(folds: jax.Array, k: int, invert: bool = False):
    """(k, n) float train/test mask pairs.

    ``invert=True`` reproduces the reference's >4000-row behavior: train on
    ONE fold and test on the other k-1 (V73:227-232)."""
    fold_ids = jnp.arange(k)[:, None]
    is_fold = (folds[None, :] == fold_ids).astype(jnp.float32)
    if invert:
        train, test = is_fold, 1.0 - is_fold
    else:
        train, test = 1.0 - is_fold, is_fold
    return train, test
