"""k-fold cross-validation of the six-algorithm zoo.

Reference semantics (V73:220-320): assign k=10 folds once, then per fold train
all six algorithms on the train split and collect test-split residuals,
concatenated fold-major into one vector per algorithm; when the dataset
exceeds 4000 rows the split is INVERTED — train on one fold, test on the other
nine (V73:227-232, preserved behind ``invert``).  The NN response is
min-shifted/max-scaled to [0,1] using *train-split* statistics per fold
(V73:234-241).

TPU-native: gam/nn/mars/svm folds are vmapped (sample-weight masks give every
fold the same static shapes); gbm.step batches ALL outer folds into one
while_loop (models/gbm_step.fit_outer_batched — 100 boosting chains advance
in lockstep); RF runs fold-sequential to keep peak memory flat, with all
per-fold compute jitted.  With a device mesh, every batch axis above shards
across the chips — including the gbm.step chain axis and the RF folds.
"""
from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models import brt, gam, gbm_step, mars, nn, rf, svm
from .kfold import fold_masks, kfold

from ..utils.precision import highest_precision

log = logging.getLogger("machisplin_tpu.cv")

# NN letter: max (vmap width x rows x L-BFGS iterations) per device program
# — above this the loop advances in segmented dispatches (see
# _nn_letter_segmented); bit-identical, bounded program duration
_NN_DISPATCH_WORK = int(1.5e9)


@dataclasses.dataclass(frozen=True)
class CVConfig:
    """Hyperparameters; defaults mirror the reference's CV call sites
    (V73:247-252).  Tests shrink these for speed."""

    n_folds: int = 10
    invert_threshold: int = 4000
    brt: dict = dataclasses.field(
        default_factory=lambda: dict(
            tree_complexity=25, learning_rate=0.01, bag_fraction=0.5,
            step_size=50, max_trees=10000,
        )
    )
    rf: dict = dataclasses.field(default_factory=lambda: dict(ntree=500))
    rf_group: int = 1          # single-device (response x fold) RF vmap width
    nn: dict = dataclasses.field(default_factory=lambda: dict(hidden=10, maxit=10000))
    mars: dict = dataclasses.field(default_factory=dict)
    svm: dict = dataclasses.field(default_factory=dict)
    gam: dict = dataclasses.field(default_factory=dict)


def _nn_fold(key, x, y, train_w, cfg):
    """NN with the reference's per-fold [0,1] response transform."""
    yn, y_min, y_max = _nn_y_transform(y, train_w)
    state = nn.fit(key, x, yn, sample_weight=train_w, **cfg)
    return nn.predict(state, x) * y_max + y_min


def _nn_y_transform(y, train_w):
    """The reference's train-split min-shift/max-scale (V73:234-241)."""
    big = jnp.finfo(y.dtype).max
    y_min = jnp.min(jnp.where(train_w > 0, y, big))
    y_shift = y - y_min
    y_max = jnp.maximum(jnp.max(jnp.where(train_w > 0, y_shift, -big)), 1e-12)
    return y_shift / y_max, y_min, y_max


def _nn_letter_segmented(keys, flat_y, flat_w, x, nn_cfg, maxit, seg,
                         batched_jit, vmap_chunk, pad_to):
    """The NN CV letter with the L-BFGS loop advanced in bounded
    dispatches: init carry -> K x fit_carry_steps -> predict, vmapped over
    the (response x fold) axis in ``vmap_chunk`` groups.  Identical update
    sequence to the single-dispatch path (nn.fit's scan), so results match
    bit-for-bit; only the program boundaries move."""
    decay = float(nn_cfg.pop("decay", 0.0))
    init_kw = {k: v for k, v in nn_cfg.items() if k in ("hidden", "init_range")}

    def init_one(kk, yy, ww):
        yn, _, _ = _nn_y_transform(yy, ww)
        return nn.fit_carry_init(kk, x, yn, sample_weight=ww, **init_kw)

    def pred_one(carry, yy, ww):
        _, y_min, y_max = _nn_y_transform(yy, ww)
        return nn.predict(nn.carry_to_state(carry), x) * y_max + y_min

    def step_fn(steps):
        def one(carry, yy, ww):
            yn, _, _ = _nn_y_transform(yy, ww)
            return nn.fit_carry_steps(
                carry, x, yn, sample_weight=ww, steps=steps, decay=decay
            )

        return batched_jit(jax.vmap(one), 3)

    init_v = batched_jit(jax.vmap(init_one), 3)
    pred_v = batched_jit(jax.vmap(pred_one), 3)
    segments = [seg] * (maxit // seg) + ([maxit % seg] if maxit % seg else [])
    step_v = {s: step_fn(s) for s in sorted(set(segments))}

    m = keys.shape[0]
    outs = []
    for s0 in range(0, m, vmap_chunk):
        part = [a[s0 : s0 + vmap_chunk] for a in (keys, flat_y, flat_w)]
        mm = part[0].shape[0]
        rem = (-mm) % pad_to
        if rem:
            part = [jnp.concatenate([a, jnp.repeat(a[:1], rem, axis=0)]) for a in part]
        kk, yy, ww = part
        carry = init_v(kk, yy, ww)
        for s in segments:
            carry = step_v[s](carry, yy, ww)
        outs.append(pred_v(carry, yy, ww)[:mm])
    return jnp.concatenate(outs, axis=0)


@highest_precision
def run_cv(
    key,
    x,
    y,
    *,
    config: CVConfig | None = None,
    algorithms: str = "bgnmrv",
    vmap_chunk: int = 64,
    mesh=None,
) -> dict[str, np.ndarray]:
    """Returns {letter: fold-major concatenated test residuals}.

    ``y`` may be (n,) for one response or (n, R) for a batch — the TPU-native
    replacement for the reference's deleted per-response snowfall fan-out
    (old/...V69.R:936-969): every (response, fold) model of the vmappable
    algorithms trains in one program (chunked at ``vmap_chunk``), and the
    gbm.step chains batch per response.  Fold assignment is drawn per
    response, as the reference does inside its layer loop (V73:221).
    Multi-response output is {letter: (R, n_concat)}.

    ``mesh``: optional device mesh — every algorithm shards across it: the
    (response x fold) batch axis of the vmappable algorithms (g/n/m/v), the
    gbm.step outer-chain axis (all boosting chains advance in lockstep,
    each device carrying its share), and the RF fold axis in device-count
    groups.  x replicates; chains/folds are independent, so sharded results
    match the single-device run.
    """
    config = config or CVConfig()

    def batched_jit(fn, nargs):
        """jit a vmapped fold-fitter, sharding its leading batch axis."""
        if mesh is None:
            return jax.jit(fn)
        from jax.sharding import NamedSharding, PartitionSpec as P

        s = NamedSharding(mesh, P(mesh.axis_names[0]))
        return jax.jit(fn, in_shardings=(s,) * nargs, out_shardings=s)

    x = jnp.asarray(x)
    y = jnp.asarray(y)
    single = y.ndim == 1
    ys = (y[:, None] if single else y).astype(x.dtype)       # (n, R)
    n, n_resp = ys.shape
    k = config.n_folds
    kf, kb, kr, kn, ks = jax.random.split(key, 5)
    invert = n > config.invert_threshold
    tr_list, te_list = [], []
    for r in range(n_resp):
        folds = kfold(jax.random.fold_in(kf, r), n, k)
        tr, te = fold_masks(folds, k, invert=invert)
        tr_list.append(tr)
        te_list.append(te)
    train_w = jnp.stack(tr_list).astype(x.dtype)             # (R, K, n)
    test_w = jnp.stack(te_list).astype(x.dtype)

    # flattened (response x fold) axis for the vmappable algorithms
    flat_w = train_w.reshape(n_resp * k, n)
    flat_y = jnp.repeat(ys.T, k, axis=0)                     # (R*K, n)

    pad_to = 1 if mesh is None else int(np.prod(mesh.devices.shape))

    def chunked(fn, *args, chunk: int | None = None):
        m = args[0].shape[0]
        chunk = vmap_chunk if chunk is None else max(1, min(chunk, vmap_chunk))
        outs = []
        for s in range(0, m, chunk):
            part = [a[s : s + chunk] for a in args]
            mm = part[0].shape[0]
            rem = (-mm) % pad_to  # sharded batch axes must divide the mesh
            if rem:
                part = [jnp.concatenate([a, jnp.repeat(a[:1], rem, axis=0)]) for a in part]
            outs.append(fn(*part)[:mm])
        return jnp.concatenate(outs, axis=0)

    # memory-aware vmap widths: a batched model's HBM footprint is
    # per_model_f32 words x width; bound it to ~2 GB so the 19-response x
    # 10k-station shape (config 3) cannot blow the worker (round-5 crash)
    def mem_chunk(per_model_f32: float) -> int:
        return max(1, min(vmap_chunk, int(0.5e9 // max(per_model_f32, 1.0))))

    preds: dict[str, Any] = {}

    def _letter_done(letter, t0):
        # per-letter progress (INFO) with a forced completion sync:
        # localizes crashes/stalls at scale — the round-5 config-3 TPU
        # worker crash was phase-anonymous under async dispatch.  The one
        # scalar readback per letter is noise next to any letter's work.
        float(jnp.nansum(preds[letter]))
        log.info("cv letter %s done in %.1f s", letter, time.perf_counter() - t0)

    if "g" in algorithms:
        t0 = time.perf_counter()
        fit_g = batched_jit(jax.vmap(
            lambda yy, w: gam.predict(gam.fit(None, x, yy, sample_weight=w, **config.gam), x)
        ), 2)
        preds["g"] = chunked(fit_g, flat_y, flat_w)
        _letter_done("g", t0)
    if "n" in algorithms:
        t0 = time.perf_counter()
        keys = jax.random.split(kn, n_resp * k)
        nn_cfg = dict(config.nn)
        maxit = int(nn_cfg.pop("maxit", 10000))
        width = min(vmap_chunk, n_resp * k)
        # bound ONE dispatch's L-BFGS work (width x rows x iters): at
        # config-3 scale a single 10000-step program holds the chip for
        # minutes (pool-watchdog territory); segment the loop across
        # dispatches instead — bit-identical (test_nn_segmented_carry...)
        seg = (
            maxit if width * n * maxit <= _NN_DISPATCH_WORK
            else max(200, int(_NN_DISPATCH_WORK // max(width * n, 1)))
        )
        if seg >= maxit:
            fit_n = batched_jit(jax.vmap(lambda kk, yy, w: _nn_fold(kk, x, yy, w, config.nn)), 3)
            preds["n"] = chunked(fit_n, keys, flat_y, flat_w)
        else:
            preds["n"] = _nn_letter_segmented(
                keys, flat_y, flat_w, x, nn_cfg, maxit, seg, batched_jit,
                vmap_chunk, pad_to,
            )
        _letter_done("n", t0)
    if "m" in algorithms:
        t0 = time.perf_counter()
        fit_m = batched_jit(jax.vmap(
            lambda yy, w: mars.predict(mars.fit(None, x, yy, sample_weight=w, **config.mars), x)
        ), 2)
        # the forward pass scores every span-filtered candidate at once:
        # a handful of (n, p x n_knots) panels per model
        p_pad = max(int(x.shape[1]), 1)
        nk = int(config.mars.get("n_knots", 64))
        preds["m"] = chunked(
            fit_m, flat_y, flat_w, chunk=mem_chunk(8.0 * n * p_pad * nk)
        )
        _letter_done("m", t0)
    if "v" in algorithms:
        t0 = time.perf_counter()
        keys = jax.random.split(ks, n_resp * k)
        if invert:
            # n > 4000: each model TRAINS on one ~n/k-row fold (V73:227-232).
            # The masks are concrete here, so gather the active rows instead
            # of carrying masked (n, n) kernels — the K matrix shrinks
            # (n/k)^2-fold (at config 3: 400 MB -> 4 MB per model), which is
            # the difference between the SVM letter crashing the worker and
            # running comfortably vmapped.
            w_np = np.asarray(flat_w)
            act = w_np > 0
            n_tr = int(act.sum(axis=1).max())
            m_all = n_resp * k
            idx = np.zeros((m_all, n_tr), np.int64)
            wg = np.zeros((m_all, n_tr), np.float32)
            for mi in range(m_all):
                ii = np.flatnonzero(act[mi])
                idx[mi, : len(ii)] = ii          # pad rows repeat index 0
                wg[mi, : len(ii)] = w_np[mi, ii]  # ...at weight 0 (inactive)
            x_np = np.asarray(x)
            xg = jnp.asarray(x_np[idx], x.dtype)               # (M, n_tr, p)
            yg = jnp.take_along_axis(flat_y, jnp.asarray(idx), axis=1)
            wg = jnp.asarray(wg, x.dtype)
            fit_v = batched_jit(jax.vmap(
                lambda kk, xx, yy, ww: svm.predict(
                    svm.fit(kk, xx, yy, sample_weight=ww, **config.svm), x
                )
            ), 4)
            preds["v"] = chunked(
                fit_v, keys, xg, yg, wg,
                chunk=mem_chunk(3.0 * n_tr * n_tr + 2.0 * n * n_tr),
            )
        else:
            fit_v = batched_jit(jax.vmap(
                lambda kk, yy, w: svm.predict(svm.fit(kk, x, yy, sample_weight=w, **config.svm), x)
            ), 3)
            preds["v"] = chunked(
                fit_v, keys, flat_y, flat_w, chunk=mem_chunk(5.0 * n * n)
            )
        _letter_done("v", t0)
    if "r" in algorithms:
        t0 = time.perf_counter()
        keys_r = [jax.random.fold_in(kr, i) for i in range(n_resp * k)]
        # predictions at x come from the growers' own node assignments
        # (RFState.train_pred) — round 5 removed the per-tree gather walk
        # rf.predict ran here (it serialised: letter r was 9.5 s of which
        # the 20 forest FITS were only ~1 s, RF_FIT_BENCH.json)
        rf_one = lambda kk, yy, w: rf.fit(
            kk, x, yy, sample_weight=w, **config.rf
        ).train_pred
        # fold models run in vmapped groups: on a mesh each device trains
        # ONE forest at a time (group = device count, peak memory matches
        # the serial loop).  Single-device groups stay at width 1: a
        # 5-wide vmapped grower was MEASURED SLOWER on chip (12.7 s vs
        # 7.8 s for the 20 (response x fold) forests — the batched
        # histogram matmuls tile worse than 20 serial dispatches), so the
        # knob exists but defaults to the serial layout.
        group = (
            int(np.prod(mesh.devices.shape)) if mesh is not None
            else min(config.rf_group, n_resp * k)
        )
        fit_rv = batched_jit(jax.vmap(rf_one), 3)
        keys_arr = jnp.stack(keys_r)
        rows = []
        for s in range(0, n_resp * k, group):
            part = [a[s : s + group] for a in (keys_arr, flat_y, flat_w)]
            mm = part[0].shape[0]
            rem = (-mm) % group
            if rem:
                part = [
                    jnp.concatenate([a, jnp.repeat(a[:1], rem, axis=0)])
                    for a in part
                ]
            rows.append(fit_rv(*part)[:mm])
        preds["r"] = jnp.concatenate(rows, axis=0)
        _letter_done("r", t0)
    if "b" in algorithms:
        t0 = time.perf_counter()
        # ALL (response, outer-fold) gbm.step runs batched into one call:
        # each pair is just another boosting chain with its own y column;
        # with a mesh the chain axis shards across the devices (the
        # pipeline's dominant phase — the reference's HOT LOOP #1)
        preds_b, _ = gbm_step.fit_outer_batched(
            kb, x, flat_y, flat_w, mesh=mesh, **config.brt
        )
        preds["b"] = jnp.asarray(preds_b)
        _letter_done("b", t0)

    # fold-major concatenation of test residuals (V73:255-319), per response
    test_np = np.asarray(test_w) > 0                         # (R, K, n)
    y_np = np.asarray(ys)
    out: dict[str, np.ndarray] = {}
    for letter, p in preds.items():
        p_np = np.asarray(p).reshape(n_resp, k, n)
        out[letter] = np.stack([
            np.concatenate([
                y_np[test_np[r, v], r] - p_np[r, v][test_np[r, v]] for v in range(k)
            ])
            for r in range(n_resp)
        ])
        if single:
            out[letter] = out[letter][0]
    return out


def residual_matrix(cv_out: dict[str, np.ndarray], letters: str = "bgnmrv") -> np.ndarray:
    """(A, n_concat) matrix in canonical letter order for the weight search."""
    return np.stack([cv_out[letter] for letter in letters])
