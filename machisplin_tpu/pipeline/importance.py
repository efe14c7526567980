"""breakDown-style variable importance for black-box models (the SVM path).

The reference explains the final SVM with ``breakDown::broken`` on up to 200
sampled stations (seed 1313), averaging absolute per-variable contributions
(V73:562-580).  This module implements the same sampled-contribution idea:
for each sampled observation, a variable's contribution is the shift in the
model's mean prediction over the background sample when that variable is
fixed to the observation's value (the 'up'/intercept-baseline direction of
breakDown, marginalised one variable at a time).  Absolute contributions are
averaged over the sample.
"""
from __future__ import annotations

import numpy as np


def breakdown_importance(predict_fn, x, names, n_sample: int = 200, seed: int = 1313) -> dict:
    x = np.asarray(x)
    n, p = x.shape
    rng = np.random.default_rng(seed)
    if n > n_sample:
        idx = rng.choice(n, n_sample, replace=False)
        sample = x[idx]
    else:
        sample = x
    m = sample.shape[0]
    base = float(np.mean(np.asarray(predict_fn(sample))))
    acc = np.zeros(p)
    for j in range(p):
        # fix variable j to each observation's value over the whole background,
        # batched: row block i holds the background with x_j := sample[i, j]
        rep = np.tile(sample, (m, 1))
        rep[:, j] = np.repeat(sample[:, j], m)
        preds = np.asarray(predict_fn(rep)).reshape(m, m)
        contrib = preds.mean(axis=1) - base
        acc[j] = np.mean(np.abs(contrib))
    return {nm: {"contributions to SVM": float(acc[j])} for j, nm in enumerate(names)}
