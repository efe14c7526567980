"""Model zoo tests: each algorithm must learn a noisy nonlinear surface well
(R^2 gates), honor sample-weight masking (the CV fold mechanism), and produce
its reference-style importance report (V73:247-252, 447-613)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from machisplin_tpu.models import brt, gam, gbm_step, mars, nn, rf, svm, trees

NAMES = ("alt", "slope", "twi", "LONG", "LAT")


def make_data(rng, n=400, noise=0.05):
    x = rng.uniform(0, 1, size=(n, 5))
    y = (
        2.0 * x[:, 0]
        + np.sin(3 * x[:, 1])
        + 0.5 * (x[:, 2] > 0.6)
        + 0.3 * x[:, 3] * x[:, 4]
        + noise * rng.standard_normal(n)
    )
    return jnp.asarray(x), jnp.asarray(y)


def r2(y, pred):
    y, pred = np.asarray(y), np.asarray(pred)
    return 1 - np.sum((y - pred) ** 2) / np.sum((y - np.mean(y)) ** 2)


def test_gam_is_ols(rng):
    x, _ = make_data(rng)
    beta = np.array([1.0, -2.0, 0.5, 3.0, 0.0])
    y = jnp.asarray(np.asarray(x) @ beta + 4.0)
    state = gam.fit(None, x, y)
    np.testing.assert_allclose(np.asarray(gam.predict(state, x)), np.asarray(y), atol=1e-6)
    imp = gam.importance(state, NAMES)
    np.testing.assert_allclose(imp["(Intercept)"], 4.0, atol=1e-5)
    np.testing.assert_allclose([imp[n] for n in NAMES], beta, atol=1e-5)


def test_gam_weighted_equals_subset(rng):
    x, y = make_data(rng)
    w = jnp.asarray((np.arange(400) < 300).astype(float))
    full = gam.fit(None, x[:300], y[:300])
    masked = gam.fit(None, x, y, sample_weight=w)
    np.testing.assert_allclose(
        np.asarray(gam.predict(masked, x[:10])), np.asarray(gam.predict(full, x[:10])), rtol=1e-6
    )


def test_nn_learns_nonlinear(rng):
    x, y = make_data(rng)
    state = nn.fit(jax.random.PRNGKey(0), x, y, maxit=300)
    assert r2(y, nn.predict(state, x)) > 0.95
    imp = nn.importance(state, NAMES)
    assert pytest.approx(sum(imp.values()), abs=1e-6) == 1.0
    assert all(v >= 0 for v in imp.values())


def test_nn_segmented_carry_matches_fit(rng):
    """Round 5: fit_carry_init + K x fit_carry_steps must replay fit's
    exact L-BFGS sequence — segmented dispatches (the config-3 watchdog
    guard) are a pure execution-layout change."""
    x, y = make_data(rng, n=120)
    whole = nn.fit(jax.random.PRNGKey(3), x, y, maxit=120)
    carry = nn.fit_carry_init(jax.random.PRNGKey(3), x, y)
    for _ in range(4):
        carry = nn.fit_carry_steps(carry, x, y, steps=30)
    seg = nn.carry_to_state(carry)
    np.testing.assert_allclose(
        np.asarray(seg.w1), np.asarray(whole.w1), rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(nn.predict(seg, x)), np.asarray(nn.predict(whole, x)),
        rtol=0, atol=1e-5,
    )


def test_mars_recovers_hinges(rng):
    x, _ = make_data(rng)
    xa = np.asarray(x)
    y = jnp.asarray(
        2.0 * np.maximum(xa[:, 0] - 0.5, 0) - 3.0 * np.maximum(0.4 - xa[:, 1], 0) + 1.0
    )
    state = mars.fit(None, x, y)
    assert r2(y, mars.predict(state, x)) > 0.999
    imp = mars.importance(state, x, y, NAMES)
    # the two informative variables dominate the evimp-style rss criterion
    scores = {k: v["rss"] for k, v in imp.items()}
    assert scores["alt"] > scores["twi"]
    assert scores["slope"] > scores["twi"]


def test_mars_smooth_function(rng):
    x, y = make_data(rng)
    state = mars.fit(None, x, y)
    assert r2(y, mars.predict(state, x)) > 0.9


def test_mars_rsq_delta_stopping_is_data_dependent(rng):
    """earth's ForwardPass stops once the best pair's RSq gain < thresh
    (default 0.001), so term counts depend on the data — a noiseless
    single-hinge response must not spend the full pair budget, while
    thresh=0 restores the fixed-budget behavior (always n_pairs pairs)."""
    x, _ = make_data(rng)
    xa = np.asarray(x)
    y = jnp.asarray(2.0 * np.maximum(xa[:, 0] - 0.5, 0) + 1.0)
    state = mars.fit(None, x, y)
    used = int(np.sum(np.asarray(state.pair_active)))
    assert used < 10, f"forward pass should stop early, used {used} pairs"
    assert r2(y, mars.predict(state, x)) > 0.99
    # fixed-budget mode (the pre-fidelity behavior) spends everything
    state0 = mars.fit(None, x, y, thresh=0.0)
    assert int(np.sum(np.asarray(state0.pair_active))) == 10
    # a richer surface earns more pairs than the single hinge needed
    _, y_rich = make_data(rng)
    state_rich = mars.fit(None, x, y_rich)
    assert int(np.sum(np.asarray(state_rich.pair_active))) > used


def test_mars_minspan_endspan_knot_filtering(rng):
    """Selected knots must come from earth's span-filtered candidate set:
    sorted training observations at ranks endspan + j*minspan, at least
    endspan observations from either end (Friedman eq. 43/45, alpha=.05)."""
    n, p = 400, 5
    x, y = make_data(rng, n=n)
    state = mars.fit(None, x, y)
    minspan = max(1, int(np.floor(-np.log2(-(1.0 / (n * p)) * np.log1p(-0.05)) / 2.5)))
    endspan = max(1, int(np.floor(3.0 - np.log2(0.05 / p))))
    xa = np.asarray(x)
    vars_ = np.asarray(state.vars)
    knots = np.asarray(state.knots)
    pair_on = np.asarray(state.pair_active) > 0
    assert pair_on.any()
    for v, t, on in zip(vars_, knots, pair_on):
        if not on:
            continue
        xs = np.sort(xa[:, v])
        allowed = xs[np.arange(endspan, n - endspan, minspan)]
        assert np.any(np.isclose(allowed, t, rtol=0, atol=1e-7)), (
            f"knot {t} (var {v}) not in the span-filtered candidate set"
        )
        # never within endspan observations of the ends
        assert xs[endspan] <= t <= xs[n - endspan - 1]


def test_mars_weighted_equals_subset_spans(rng):
    """Fold-mask weighting must reproduce the subset fit exactly, including
    the span/stopping logic driven by the weighted training count."""
    x, y = make_data(rng)
    w = jnp.asarray((np.arange(400) < 300).astype(float))
    full = mars.fit(None, x[:300], y[:300])
    masked = mars.fit(None, x, y, sample_weight=w)
    np.testing.assert_allclose(
        np.asarray(mars.predict(masked, x[:20])),
        np.asarray(mars.predict(full, x[:20])),
        rtol=1e-4, atol=1e-4,
    )


def test_svm_fits(rng):
    x, y = make_data(rng)
    state = svm.fit(jax.random.PRNGKey(0), x, y)
    assert r2(y, svm.predict(state, x)) > 0.9
    # epsilon-insensitivity: many dual coefficients exactly at zero
    theta = np.asarray(state.theta)
    assert np.mean(np.abs(theta) < 1e-9) > 0.05


def test_svm_weighted_masks_rows(rng):
    x, y = make_data(rng, n=200)
    w = jnp.asarray((np.arange(200) < 150).astype(float))
    state = svm.fit(jax.random.PRNGKey(0), x, y, sample_weight=w)
    assert np.all(np.asarray(state.theta)[150:] == 0)


def test_svm_predict_query_chunking_exact(rng):
    """predict's internal lax.map chunking (bounded (m, n_sv) kernel
    panels, the config-3 raster-block fix) is a pure execution-layout
    change: chunked == direct."""
    x, y = make_data(rng, n=150)
    state = svm.fit(jax.random.PRNGKey(0), x, y)
    q = jnp.asarray(np.random.default_rng(5).uniform(-1, 2, (1000, x.shape[1])))
    direct = np.asarray(svm.predict(state, q, query_block=10**9))
    chunked = np.asarray(svm.predict(state, q, query_block=128))
    np.testing.assert_allclose(chunked, direct, atol=1e-5, rtol=0)


def test_svm_reaches_exact_kkt_optimum(rng):
    """The augmented-Lagrangian solver must land on the TRUE eps-SVR dual
    optimum — the same KKT point kernlab's SMO finds — not the penalized-bias
    approximation flagged in round 1.  Golden: an independent SLSQP solve of
    the dual QP in (alpha, alpha*) with the sum(alpha - alpha*) = 0 equality
    constraint (kernlab::ksvm semantics, V73:251/560)."""
    from scipy.optimize import minimize

    n = 60
    x = rng.uniform(0, 1, (n, 3))
    y = np.sin(3 * x[:, 0]) + x[:, 1] ** 2 + 0.1 * rng.standard_normal(n)
    sigma, c_reg, eps = 0.5, 1.0, 0.1
    state = svm.fit(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y),
        sigma=sigma, epochs=400,
    )

    xs = np.asarray(state.sv_x, np.float64)
    ys = (y - float(state.y_mean)) / float(state.y_scale)
    r2m = ((xs[:, None, :] - xs[None, :, :]) ** 2).sum(-1)
    kmat = np.exp(-sigma * r2m)

    def obj(z):
        t = z[:n] - z[n:]
        return 0.5 * t @ kmat @ t - ys @ t + eps * np.sum(z)

    def jac(z):
        g = kmat @ (z[:n] - z[n:])
        return np.concatenate([g - ys + eps, -g + ys + eps])

    cons = {
        "type": "eq",
        "fun": lambda z: np.sum(z[:n] - z[n:]),
        "jac": lambda z: np.concatenate([np.ones(n), -np.ones(n)]),
    }
    res = minimize(
        obj, np.zeros(2 * n), jac=jac, bounds=[(0.0, c_reg)] * (2 * n),
        constraints=[cons], method="SLSQP", options={"maxiter": 600, "ftol": 1e-14},
    )
    assert res.success
    theta_qp = res.x[:n] - res.x[n:]

    def dual_obj(t):
        return 0.5 * t @ kmat @ t - ys @ t + eps * np.sum(np.abs(t))

    ours = np.asarray(state.theta, np.float64)
    # feasibility of the equality constraint and optimality within tolerance
    assert abs(np.sum(ours)) < 1e-3
    assert dual_obj(ours) <= dual_obj(theta_qp) + 1e-4

    # prediction parity with the QP solution (bias from free-SV KKT)
    free = (np.abs(theta_qp) > 1e-5) & (np.abs(theta_qp) < c_reg - 1e-5)
    assert free.any()
    b_qp = np.mean((ys - kmat @ theta_qp - eps * np.sign(theta_qp))[free])
    f_qp = (kmat @ theta_qp + b_qp) * float(state.y_scale) + float(state.y_mean)
    f_ours = np.asarray(svm.predict(state, jnp.asarray(x)))
    assert np.max(np.abs(f_ours - f_qp)) < 0.02 * float(state.y_scale)


def test_tree_binning_roundtrip(rng):
    x, _ = make_data(rng, n=100)
    edges = trees.make_bins(x, 16)
    xb = trees.bin_data(x, edges)
    assert xb.shape == (100, 5)
    assert int(xb.min()) >= 0 and int(xb.max()) <= 15


def test_single_tree_splits_step_function(rng):
    x, _ = make_data(rng, n=300)
    xa = np.asarray(x)
    y = jnp.asarray((xa[:, 2] > 0.5).astype(float))
    edges = trees.make_bins(x, 32)
    xb = trees.bin_data(x, edges)
    w = jnp.ones(300)
    t = trees.grow_level_tree(jax.random.PRNGKey(0), xb, edges, y, w, max_depth=2, min_leaf=5.0)
    pred = trees.tree_predict(t, x, 2)
    # quantile binning caps purity when the step falls inside a bin
    assert r2(y, pred) > 0.95
    assert int(np.argmax(np.asarray(t.var_gain))) == 2


def test_rf_fits_and_importance(rng):
    x, y = make_data(rng)
    state = rf.fit(jax.random.PRNGKey(0), x, y, ntree=60, tree_chunk=20)
    assert r2(y, rf.predict(state, x)) > 0.88
    # assignment-tracked training predictions == routing the trees at x
    # (bin-space and raw-threshold routing are the same partition)
    np.testing.assert_allclose(
        np.asarray(state.train_pred), np.asarray(rf.predict(state, x)),
        atol=1e-5, rtol=0,
    )
    imp = rf.importance(state, x, y, NAMES)
    assert set(imp[NAMES[0]].keys()) == {"%IncMSE", "IncNodePurity"}
    # informative variables rank above the near-noise interaction terms
    assert imp["alt"]["IncNodePurity"] > imp["LAT"]["IncNodePurity"]


def test_brt_boosting_reduces_deviance(rng):
    x, y = make_data(rng)
    state = brt.fit(jax.random.PRNGKey(0), x, y, n_trees=150, n_splits=5, lr=0.1)
    dev = np.asarray(state.train_deviance)
    assert dev[-1] < dev[0] * 0.3
    assert r2(y, brt.predict(state, x)) > 0.9
    imp = brt.importance(state, NAMES)
    assert pytest.approx(sum(imp.values()), abs=1e-3) == 100.0


def test_brt_truncated_prediction(rng):
    x, y = make_data(rng, n=150)
    state = brt.fit(jax.random.PRNGKey(0), x, y, n_trees=60, n_splits=3, lr=0.1)
    p30 = brt.predict(state, x, n_trees=30)
    p60 = brt.predict(state, x)
    assert not np.allclose(np.asarray(p30), np.asarray(p60))


def test_gbm_step_selects_tree_count(rng):
    x, y = make_data(rng, n=250)
    res = gbm_step.fit(
        jax.random.PRNGKey(3), x, y,
        tree_complexity=3, learning_rate=0.05, step_size=25, max_trees=600, n_folds=5,
    )
    assert res.best_trees >= 25
    assert res.best_trees <= res.trees_fitted
    curve = np.asarray(res.cv_deviance)
    finite = curve[np.isfinite(curve)]
    assert len(finite) == res.trees_fitted // 25
    # the selected checkpoint is the argmin of the finite curve
    assert np.argmin(finite) == res.best_trees // 25 - 1
    assert r2(y, gbm_step.predict(res, x)) > 0.85


def test_mxu_forest_predict_matches_gather(rng):
    """The dense-algebra (path-matrix) predictor must agree exactly with
    serial tree traversal for best-first boosted trees."""
    from machisplin_tpu.models.trees import bestfirst_forest_predict_mxu, forest_predict

    x, y = make_data(rng, n=200)
    state = brt.fit(jax.random.PRNGKey(1), x, y, n_trees=40, n_splits=4, lr=0.1)
    xq = jnp.asarray(np.asarray(make_data(rng, n=500)[0]))
    w = state.tree_active * state.lr
    a = np.asarray(forest_predict(state.trees, xq, state.n_splits, weights=w))
    b = np.asarray(
        bestfirst_forest_predict_mxu(state.trees, xq, w, cell_block=128, tree_chunk=16)
    )
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_gbm_outer_batched_matches_sequential_quality(rng):
    """The batched outer-fold gbm.step path must select similar tree counts
    and deliver comparable out-of-fold accuracy to the sequential driver."""
    x, y = make_data(rng, n=240)
    w = np.zeros((3, 240), np.float32)
    folds = np.arange(240) % 3
    for f in range(3):
        w[f] = (folds != f).astype(np.float32)
    preds, best = gbm_step.fit_outer_batched(
        jax.random.PRNGKey(5), x, y, jnp.asarray(w),
        tree_complexity=3, learning_rate=0.05, step_size=25, max_trees=400, n_folds=5,
    )
    assert preds.shape == (3, 240)
    assert all(25 <= b <= 400 for b in best)
    # out-of-fold residuals beat the null model comfortably
    y_np = np.asarray(y)
    for f in range(3):
        test = w[f] == 0
        res = y_np[test] - preds[f][test]
        assert np.sum(res**2) < 0.5 * np.sum((y_np[test] - y_np[test].mean()) ** 2)


def test_gbm_per_tree_bag_draws_bit_identical(rng, monkeypatch):
    """Round 5: above the bag-draw memory budget the (T, F*K, n) batched
    tensor is replaced by per-tree draws inside the scan.  threefry is a
    pure function of the key, so the paths must be BIT-identical."""
    x, y = make_data(rng, n=160)
    w = np.zeros((2, 160), np.float32)
    folds = np.arange(160) % 2
    for f in range(2):
        w[f] = (folds != f).astype(np.float32)
    kw = dict(
        tree_complexity=3, learning_rate=0.05, step_size=20, max_trees=100,
        n_folds=4,
    )
    preds_a, best_a = gbm_step.fit_outer_batched(
        jax.random.PRNGKey(5), x, y, jnp.asarray(w), **kw
    )
    monkeypatch.setattr(gbm_step, "_BAG_BATCH_WORDS", 0)
    preds_b, best_b = gbm_step.fit_outer_batched(
        jax.random.PRNGKey(5), x, y, jnp.asarray(w), **kw
    )
    assert list(best_a) == list(best_b)
    np.testing.assert_array_equal(np.asarray(preds_a), np.asarray(preds_b))


def test_gbm_fit_multi_matches_serial_fits(rng):
    """Round-4 (VERDICT next #3): gbm.step final fits batched across
    responses.  ``fit_multi`` must reproduce each response's serial ``fit``
    statistically: the fold selectors are IDENTICAL (same ksel stream), the
    fitted models agree to high correlation, and the CV/self statistics
    blocks fill exactly as ``fit`` fills them (bag draws ride the batched
    curve's shared key chain, so best.trees may differ by a checkpoint or
    two — statistical, not bitwise, equality)."""
    x, y1 = make_data(rng, n=220)
    y2 = jnp.asarray(
        np.cos(4 * np.asarray(x)[:, 1]) + np.asarray(x)[:, 0]
        + 0.1 * rng.standard_normal(220),
        jnp.float32,
    )
    ycols = jnp.stack([y1, y2], axis=1)
    kw = dict(tree_complexity=3, learning_rate=0.05, step_size=25,
              max_trees=400, n_folds=5)
    keys = [jax.random.fold_in(jax.random.PRNGKey(9), j) for j in range(2)]
    multi = gbm_step.fit_multi(jnp.stack(keys), x, ycols, statistics=True, **kw)
    assert len(multi) == 2
    for j in range(2):
        serial = gbm_step.fit(keys[j], x, ycols[:, j], **kw)
        m = multi[j]
        np.testing.assert_array_equal(m.selector, serial.selector)
        rms_s = float(np.sqrt(np.mean(np.asarray(serial.residuals) ** 2)))
        rms_m = float(np.sqrt(np.mean(np.asarray(m.residuals) ** 2)))
        assert rms_m == pytest.approx(rms_s, rel=0.15), f"response {j} fit drifted"
        assert np.corrcoef(np.asarray(serial.fitted), np.asarray(m.fitted))[0, 1] > 0.999
        # statistics blocks present and consistent (same shapes/semantics as fit)
        assert m.cv_statistics is not None and m.self_statistics is not None
        np.testing.assert_allclose(m.residuals, np.asarray(ycols[:, j]) - m.fitted)
        assert m.self_statistics["mean.null"] == pytest.approx(
            serial.self_statistics["mean.null"], rel=1e-5
        )
        assert m.self_statistics["resid"] < m.self_statistics["null"]
        assert 25 <= m.best_trees <= 400
        # raster/point predictions from the batched result route like fit's
        pm = np.asarray(gbm_step.predict(m, x))
        np.testing.assert_allclose(pm, np.asarray(m.final.train_fit), rtol=1e-4, atol=1e-4)


def test_gbm_step_result_statistics_blocks(rng):
    """The gbm.step result carries the reference's CV/self statistics
    (V73:2014-2096, 2190-2197): per-fold deviance/correlation at best.trees,
    fitted values + residuals, between-fold fitted variance."""
    x, y = make_data(rng, n=220)
    res = gbm_step.fit(
        jax.random.PRNGKey(4), x, y,
        tree_complexity=3, learning_rate=0.05, step_size=25, max_trees=400, n_folds=5,
    )
    n = len(np.asarray(y))
    assert res.selector.shape == (n,) and set(res.selector) == set(range(5))
    assert res.fitted.shape == (n,)
    np.testing.assert_allclose(res.residuals, np.asarray(y) - res.fitted)
    assert res.fitted_vars.shape == (n,) and np.all(res.fitted_vars >= 0)
    cs, ss = res.cv_statistics, res.self_statistics
    assert 0 < cs["deviance.mean"] and cs["deviance.se"] >= 0
    assert 0.5 < cs["correlation.mean"] <= 1.0
    # self stats: intercept-only (null) deviance exceeds the model's
    assert ss["resid"] < ss["null"]
    assert ss["mean.null"] == pytest.approx(np.var(np.asarray(y)), rel=1e-6)
    assert 0.9 < ss["correlation"] <= 1.0
    # training deviance curve decreases overall
    tcurve = np.asarray(res.training_deviance)
    tcurve = tcurve[np.isfinite(tcurve)]
    assert tcurve[-1] < tcurve[0]


def test_gbm_step_restart_rule(rng):
    """A hopeless learning rate whose holdout deviance rises in the first
    cycles triggers the reference's restart rule (V73:1948-1955), automated
    as lr/2 retries."""
    x, y = make_data(rng, n=120, noise=0.05)
    # enormous lr on tiny data: the first added cycles overshoot
    res = gbm_step.fit(
        jax.random.PRNGKey(2), x, jnp.asarray(50.0) * y,
        tree_complexity=2, learning_rate=2.0, step_size=25, max_trees=200,
        n_folds=4, max_restarts=4,
    )
    assert res.restarts >= 1
    assert res.learning_rate < 2.0
    assert res.learning_rate == pytest.approx(2.0 * 0.5**res.restarts)


def test_gbm_families_recover_link_scale(rng):
    """Non-gaussian boosting (V73:1673 family argument) recovers the signal
    on the response scale for poisson counts and bernoulli outcomes, and
    laplace tracks the conditional median."""
    n = 400
    x = jnp.asarray(rng.uniform(-1, 1, (n, 3)))
    eta = 1.0 + 1.2 * np.asarray(x)[:, 0] - 0.8 * np.asarray(x)[:, 1]

    y_pois = jnp.asarray(rng.poisson(np.exp(eta)).astype(np.float64))
    res_p = gbm_step.fit(
        jax.random.PRNGKey(11), x, y_pois, family="poisson",
        tree_complexity=3, learning_rate=0.05, step_size=25, max_trees=400, n_folds=4,
    )
    mu = np.asarray(gbm_step.predict(res_p, x, type="response"))
    assert np.all(mu > 0)
    assert np.corrcoef(mu, np.exp(eta))[0, 1] > 0.9

    p_true = 1 / (1 + np.exp(-eta))
    y_bin = jnp.asarray((rng.uniform(size=n) < p_true).astype(np.float64))
    res_b = gbm_step.fit(
        jax.random.PRNGKey(12), x, y_bin, family="bernoulli",
        tree_complexity=3, learning_rate=0.05, step_size=25, max_trees=400, n_folds=4,
    )
    p_hat = np.asarray(gbm_step.predict(res_b, x, type="response"))
    assert np.all((p_hat > 0) & (p_hat < 1))
    assert np.corrcoef(p_hat, p_true)[0, 1] > 0.6
    # prevalence stratification balanced the folds
    sel = res_b.selector
    y_np = np.asarray(y_bin)
    pres_counts = [np.sum((sel == f) & (y_np == 1)) for f in range(4)]
    assert max(pres_counts) - min(pres_counts) <= 1

    y_lap = jnp.asarray(eta + rng.standard_t(2, n))  # heavy-tailed noise
    res_l = gbm_step.fit(
        jax.random.PRNGKey(13), x, y_lap, family="laplace",
        tree_complexity=3, learning_rate=0.05, step_size=25, max_trees=400, n_folds=4,
    )
    f_hat = np.asarray(gbm_step.predict(res_l, x))
    assert np.mean(np.abs(f_hat - eta)) < np.mean(np.abs(eta.mean() - eta))


def test_make_bins_masked_matches_subset_quantiles(rng):
    """Masked bin edges equal jnp.quantile on the active subset — the
    per-inner-fold split candidates each fold's gbm would compute."""
    x = jnp.asarray(rng.uniform(0, 10, (100, 3)))
    w = jnp.asarray((rng.uniform(size=100) < 0.7).astype(np.float64))
    got = np.asarray(trees.make_bins_masked(x, w, n_bins=16))
    want = np.asarray(trees.make_bins(np.asarray(x)[np.asarray(w) > 0], n_bins=16))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_bin_interval_forest_predict_matches_gather(rng):
    """The bin-interval leaf predictor (ops/pallas_forest) must agree exactly
    with serial traversal — jnp twin AND the Pallas kernel in interpret mode —
    for both best-first (BRT) and level-wise (RF) trees."""
    from machisplin_tpu.models.trees import forest_predict
    from machisplin_tpu.ops.pallas_forest import build_leaf_bins, forest_predict_bins

    x, y = make_data(rng, n=200)
    state = brt.fit(jax.random.PRNGKey(1), x, y, n_trees=40, n_splits=4, lr=0.1)
    xq = jnp.asarray(np.asarray(make_data(rng, n=500)[0]))
    w = state.tree_active * state.lr
    a = np.asarray(forest_predict(state.trees, xq, state.n_splits, weights=w))
    tabs = build_leaf_bins(state.trees, n_feat=xq.shape[1])
    jnp_path = np.asarray(
        forest_predict_bins(state.trees, xq, w, tables=tabs, use_pallas=False)
    )
    np.testing.assert_allclose(jnp_path, a, rtol=1e-5, atol=1e-6)
    kernel_path = np.asarray(
        forest_predict_bins(
            state.trees, xq, w, tables=tabs, use_pallas=True, interpret=True
        )
    )
    np.testing.assert_allclose(kernel_path, a, rtol=1e-5, atol=1e-6)
    # the opt-in bf16 membership STORAGE (compares always run in f32 —
    # Mosaic v5e rejects packed-bf16 cmpf) is EXACT: bin indices/bounds are
    # integers <= 256 and masks are 0/1, so zero mask flips vs the f32
    # default; the paths agree to the f32 matvec's accumulation order
    bf16_path = np.asarray(
        forest_predict_bins(
            state.trees, xq, w, tables=tabs, use_pallas=True, interpret=True,
            membership_dtype="bfloat16",
        )
    )
    np.testing.assert_allclose(kernel_path, bf16_path, rtol=1e-6, atol=1e-7)

    rf_state = rf.fit(jax.random.PRNGKey(2), x, y, ntree=25, tree_chunk=5)
    a_rf = np.asarray(forest_predict(rf_state.trees, xq, rf_state.max_depth))
    t = rf_state.trees.feat.shape[0]
    rf_bins = np.asarray(
        forest_predict_bins(
            rf_state.trees, xq, jnp.full(t, 1.0 / t), use_pallas=False
        )
    )
    np.testing.assert_allclose(rf_bins, a_rf, rtol=1e-5, atol=1e-6)


def test_bin_interval_multi_response_weights(rng):
    """(T, R) weight matrices: R weighted reductions of one stacked tree
    pool in a single pass (the response-batched gbm.step raster path).
    Each column must equal the corresponding single-forest prediction —
    jnp twin and interpret-mode kernel."""
    from machisplin_tpu.ops.pallas_forest import build_leaf_bins, forest_predict_bins

    x, y1 = make_data(rng, n=200)
    y2 = jnp.asarray(
        np.asarray(x)[:, 0] * 2 - np.cos(3 * np.asarray(x)[:, 1])
        + 0.1 * rng.standard_normal(200)
    )
    s1 = brt.fit(jax.random.PRNGKey(1), x, y1, n_trees=30, n_splits=3, lr=0.1)
    s2 = brt.fit(jax.random.PRNGKey(2), x, y2, n_trees=30, n_splits=3, lr=0.1)
    merged = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=0), s1.trees, s2.trees
    )
    wmat = np.zeros((60, 2), np.float32)
    wmat[:30, 0] = np.asarray(s1.tree_active) * 0.1
    wmat[30:, 1] = np.asarray(s2.tree_active) * 0.1
    xq = jnp.asarray(rng.uniform(0, 1, (300, x.shape[1])))
    tabs = build_leaf_bins(merged, n_feat=x.shape[1])
    for kw in (dict(use_pallas=False), dict(use_pallas=True, interpret=True)):
        out = np.asarray(
            forest_predict_bins(merged, xq, jnp.asarray(wmat), tables=tabs, **kw)
        )
        assert out.shape == (300, 2)
        want1 = np.asarray(brt.predict(s1, xq)) - float(s1.f0)
        want2 = np.asarray(brt.predict(s2, xq)) - float(s2.f0)
        np.testing.assert_allclose(out[:, 0], want1, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(out[:, 1], want2, rtol=1e-5, atol=1e-5)


def test_bin_interval_predicated_feature_skips(rng):
    """predicate=True (chunk-level feature skipping over the feature-set-
    sorted leaf order) must agree EXACTLY with the unpredicated kernel and
    with serial traversal — a skipped feature's interval is [0, B-1] for
    every leaf in its chunk, so the skip is algebraically a no-op.  Uses
    shallow trees over many features so skips genuinely fire, plus a (T, R)
    weight matrix to cover the merged multi-response raster path."""
    from machisplin_tpu.models.trees import forest_predict
    from machisplin_tpu.ops.pallas_forest import build_leaf_bins, forest_predict_bins

    n, p = 300, 11
    x = jnp.asarray(rng.uniform(0, 1, size=(n, p)))
    xa = np.asarray(x)
    y1 = jnp.asarray(2.0 * xa[:, 0] + np.sin(3 * xa[:, 5]) + 0.1 * rng.standard_normal(n))
    y2 = jnp.asarray(xa[:, 9] - 0.5 * xa[:, 2] + 0.1 * rng.standard_normal(n))
    s1 = brt.fit(jax.random.PRNGKey(5), x, y1, n_trees=40, n_splits=3, lr=0.1)
    s2 = brt.fit(jax.random.PRNGKey(6), x, y2, n_trees=40, n_splits=3, lr=0.1)
    merged = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=0), s1.trees, s2.trees
    )
    wmat = np.zeros((80, 2), np.float32)
    wmat[:40, 0] = np.asarray(s1.tree_active) * 0.1
    wmat[40:, 1] = np.asarray(s2.tree_active) * 0.1
    xq = jnp.asarray(rng.uniform(0, 1, (500, p)))
    tabs = build_leaf_bins(merged, n_feat=p)
    # the sort actually grouped leaves: some chunk must skip some feature
    cons = (tabs.lo[:p] > 0) | (tabs.hi[:p] < tabs.n_bins - 1)
    act = cons.reshape(p, -1, 128).any(axis=2)  # 128-leaf granules
    assert not act.all(), "expected at least one inactive (chunk, feature)"
    want1 = np.asarray(brt.predict(s1, xq)) - float(s1.f0)
    want2 = np.asarray(brt.predict(s2, xq)) - float(s2.f0)
    base = np.asarray(
        forest_predict_bins(
            merged, xq, jnp.asarray(wmat), tables=tabs,
            use_pallas=True, interpret=True, predicate=False,
        )
    )
    pred = np.asarray(
        forest_predict_bins(
            merged, xq, jnp.asarray(wmat), tables=tabs,
            use_pallas=True, interpret=True, predicate=True,
        )
    )
    np.testing.assert_array_equal(base, pred)   # bit-identical masks
    np.testing.assert_allclose(pred[:, 0], want1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(pred[:, 1], want2, rtol=1e-5, atol=1e-5)
    # the branch-free STATIC-SEGMENT variant (one pallas_call per
    # contiguous chunk run with the run's feature union) must also match
    segd = np.asarray(
        forest_predict_bins(
            merged, xq, jnp.asarray(wmat), tables=tabs,
            use_pallas=True, interpret=True, segments=True, leaf_chunk=128,
        )
    )
    np.testing.assert_allclose(segd, base, rtol=1e-6, atol=1e-6)
    # single-response weights through both skip paths too
    for kw in (dict(predicate=True), dict(segments=True, leaf_chunk=128)):
        got1 = np.asarray(
            forest_predict_bins(
                s1.trees, xq, s1.tree_active * s1.lr,
                use_pallas=True, interpret=True, **kw,
            )
        )
        np.testing.assert_allclose(got1, want1, rtol=1e-5, atol=1e-5)


def test_gam_smooth_recovers_nonlinear_additive(rng):
    """The opt-in P-spline GAM (SURVEY §7's "true GAM" extension) must
    recover a smooth nonlinear additive signal that the reference's
    degenerate OLS formula cannot, and its GCV lambda must avoid both
    interpolation and over-smoothing."""
    n = 400
    x = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    truth = np.sin(2.2 * x[:, 0]) + 0.5 * x[:, 1] ** 2 - 0.3 * x[:, 2]
    y = (truth + 0.1 * rng.standard_normal(n)).astype(np.float32)

    ols = gam.fit(None, jnp.asarray(x), jnp.asarray(y))
    sm = gam.fit(None, jnp.asarray(x), jnp.asarray(y), smooth=True)

    xt = rng.uniform(-1.9, 1.9, (300, 3)).astype(np.float32)
    tt = np.sin(2.2 * xt[:, 0]) + 0.5 * xt[:, 1] ** 2 - 0.3 * xt[:, 2]

    def r2(pred):
        return 1 - np.sum((tt - pred) ** 2) / np.sum((tt - tt.mean()) ** 2)

    r2_ols = r2(np.asarray(gam.predict(ols, xt)))
    r2_sm = r2(np.asarray(gam.predict(sm, xt)))
    assert r2_sm > 0.95
    assert r2_sm > r2_ols + 0.2     # the smooths capture real structure
    imp = gam.importance(sm, ["a", "b", "c"])
    assert imp["a"]["s_norm"] > imp["c"]["s_norm"]  # linear term needs no wiggle


def test_mars_knot_grid_covers_upper_quantiles(rng):
    """Round-3 regression (ADVICE r2, high): a bare es + ms*j rank grid
    bottom-anchors the candidate knots — with n ~ 800 and the automatic
    spans no candidate sat above the ~50th percentile, so a hinge at the
    0.8 quantile fit R^2 ~ 0.5.  The strided grid must cover the whole
    span-eligible range and fit symmetric upper/lower hinges equally."""
    n, p = 800, 7
    x = jnp.asarray(rng.uniform(0, 1, size=(n, p)))
    xa = np.asarray(x)
    for q in (0.2, 0.8):
        t = float(np.quantile(xa[:, 0], q))
        y = jnp.asarray(3.0 * np.maximum(xa[:, 0] - t, 0) + 1.0)
        state = mars.fit(None, x, y)
        got = r2(y, mars.predict(state, x))
        assert got > 0.95, f"hinge at the {q} quantile fit R^2 {got:.3f}"


def test_bin_interval_forest_many_features(rng):
    """Round-3 regression (VERDICT Missing #3): the bin-interval leaf
    predictor must handle forests over MORE than 8 features (arbitrary
    covariate stacks, terra::predict V73:468) — the feature axis pads to
    the sublane granule instead of raising."""
    from machisplin_tpu.models.trees import forest_predict
    from machisplin_tpu.ops.pallas_forest import build_leaf_bins, forest_predict_bins

    n, p = 300, 11
    x = jnp.asarray(rng.uniform(0, 1, size=(n, p)))
    xa = np.asarray(x)
    y = jnp.asarray(
        2.0 * xa[:, 0] + np.sin(3 * xa[:, 5]) + 0.5 * (xa[:, 9] > 0.4)
        + 0.05 * rng.standard_normal(n)
    )
    state = brt.fit(jax.random.PRNGKey(3), x, y, n_trees=30, n_splits=4, lr=0.1)
    xq = jnp.asarray(rng.uniform(0, 1, size=(500, p)))
    w = state.tree_active * state.lr
    want = np.asarray(forest_predict(state.trees, xq, state.n_splits, weights=w))
    tabs = build_leaf_bins(state.trees, n_feat=p)
    assert tabs.etab.shape[0] == 16          # 11 features pad to 2 granules
    got = np.asarray(forest_predict_bins(state.trees, xq, w, tables=tabs, use_pallas=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    kern = np.asarray(
        forest_predict_bins(state.trees, xq, w, tables=tabs, use_pallas=True, interpret=True)
    )
    np.testing.assert_allclose(kern, want, rtol=1e-5, atol=1e-6)


def test_gam_smooth_masked_equals_subset(rng):
    """fit_smooth's knot placement and standardisation must come from the
    ACTIVE rows only (ADVICE r2: unweighted quantiles leak held-out
    covariates into CV folds) — the fold-mask fit must equal the subset fit."""
    n = 400
    x = rng.uniform(-2, 2, (n, 3)).astype(np.float64)
    y = (np.sin(2 * x[:, 0]) + 0.5 * x[:, 1] + 0.1 * rng.standard_normal(n))
    w = jnp.asarray((np.arange(n) < 300).astype(np.float64))
    sub = gam.fit(None, jnp.asarray(x[:300]), jnp.asarray(y[:300]), smooth=True)
    msk = gam.fit(None, jnp.asarray(x), jnp.asarray(y), sample_weight=w, smooth=True)
    np.testing.assert_allclose(np.asarray(msk.knots), np.asarray(sub.knots), rtol=1e-10)
    xt = jnp.asarray(rng.uniform(-1.8, 1.8, (50, 3)))
    np.testing.assert_allclose(
        np.asarray(gam.predict(msk, xt)), np.asarray(gam.predict(sub, xt)), rtol=1e-6, atol=1e-8
    )


def test_nn_maxit_plateaus_by_default(rng):
    """PARITY (VERDICT Weak #5): the NN defaults now run maxit=10000 like
    nnet (V73:249).  Convergence evidence for docs/PARITY.md: held-out
    accuracy plateaus well before the default — a 1500-iteration fit and a
    4000-iteration fit must agree to within the seed-to-seed noise floor
    (measured ~0.001 R^2), so the 10000 default is safely converged."""
    n = 800
    x = rng.uniform(0, 1, size=(n, 5))
    y = (
        2 * x[:, 0] + np.sin(3 * x[:, 1]) + 0.5 * (x[:, 2] > 0.6)
        + 0.3 * x[:, 3] * x[:, 4] + 0.05 * rng.standard_normal(n)
    )
    xtr, ytr = jnp.asarray(x[:500]), jnp.asarray(y[:500])
    xte, yte = x[500:], y[500:]

    def heldout_r2(maxit):
        s = nn.fit(jax.random.PRNGKey(5), xtr, ytr, maxit=maxit)
        p = np.asarray(nn.predict(s, jnp.asarray(xte)))
        return 1 - np.sum((p - yte) ** 2) / np.sum((yte - yte.mean()) ** 2)

    r_mid, r_late = heldout_r2(1500), heldout_r2(4000)
    assert r_mid > 0.98 and r_late > 0.98
    assert abs(r_late - r_mid) < 3e-3


def test_bestfirst_grower_matches_numpy_reference(rng):
    """The incremental (gain-cached, sibling-subtraction) best-first grower
    must reproduce an independent greedy reference: J splits, each taking
    the leaf/feature/bin with the largest SSE decrease subject to min_leaf,
    leaf values = weighted means."""
    n, p, nb, n_splits, min_leaf = 120, 3, 8, 5, 4.0
    x = rng.uniform(0, 1, (n, p))
    y = 2 * x[:, 0] - np.sin(5 * x[:, 1]) + 0.1 * rng.standard_normal(n)
    w = (rng.uniform(size=n) < 0.85).astype(np.float64)
    edges = np.quantile(x, np.linspace(0, 1, nb + 1)[1:-1], axis=0).T  # (p, nb-1)
    xb = np.sum(x[:, :, None] > edges[None], axis=2)

    # --- independent reference -------------------------------------------
    def best_split(rows):
        best = (-np.inf, 0, 0)
        for f in range(p):
            for b in range(nb - 1):
                lm = rows & (xb[:, f] <= b)
                rm = rows & ~(xb[:, f] <= b)
                lw, rw = w[lm].sum(), w[rm].sum()
                if lw < min_leaf or rw < min_leaf:
                    continue
                tw = lw + rw
                lwy, rwy = (w * y)[lm].sum(), (w * y)[rm].sum()
                gain = lwy**2 / lw + rwy**2 / rw - (lwy + rwy) ** 2 / tw
                if gain > best[0]:
                    best = (gain, f, b)
        return best

    leaves = {0: w > 0}          # node id -> row mask (active rows only)
    cand = {0: best_split(leaves[0])}
    ref_splits = []              # (node, feat, bin)
    for k in range(n_splits):
        q = max(cand, key=lambda i: cand[i][0])
        gain, f, b = cand[q]
        if gain <= 1e-9:
            break
        rows = leaves.pop(q)
        del cand[q]
        lid, rid = 2 * k + 1, 2 * k + 2
        leaves[lid] = rows & (xb[:, f] <= b)
        leaves[rid] = rows & ~(xb[:, f] <= b)
        cand[lid], cand[rid] = best_split(leaves[lid]), best_split(leaves[rid])
        ref_splits.append((q, f, b))

    tree, cur = trees.grow_bestfirst_tree(
        jnp.asarray(xb, jnp.int32), jnp.asarray(edges), jnp.asarray(y),
        jnp.asarray(w), n_splits=n_splits, min_leaf=min_leaf, return_assign=True,
    )
    feat, internal = np.asarray(tree.feat), np.asarray(tree.internal)
    thr_bin_got = [
        int(np.searchsorted(edges[feat[q]], np.asarray(tree.thr)[q], side="left"))
        for q in range(len(feat))
    ]
    for k, (q, f, b) in enumerate(ref_splits):
        assert internal[q] > 0, f"step {k}: node {q} should have split"
        assert feat[q] == f and thr_bin_got[q] == b, (
            f"step {k}: node {q} split ({feat[q]}, {thr_bin_got[q]}) != ref ({f}, {b})"
        )
    # leaf values: weighted means over final assignments
    cur = np.asarray(cur)
    for q, rows in leaves.items():
        if w[rows].sum() > 0:
            want = (w * y)[rows].sum() / w[rows].sum()
            got = float(np.asarray(tree.value)[q])
            assert got == pytest.approx(want, rel=1e-4)
            np.testing.assert_array_equal(np.unique(cur[rows]), [q])


def test_mars_degree2_interactions(rng):
    """degree=2 (opt-in; earth's degree arg — the reference call sites use
    the degree-1 default, V73:250/539) recovers a pure product-hinge signal
    that the additive model structurally cannot, the parent bookkeeping is
    consistent, and degree=1 states keep an all-intercept parent chain."""
    x, _ = make_data(rng, n=400)
    xa = np.asarray(x)
    y = jnp.asarray(
        4.0 * np.maximum(xa[:, 0] - 0.3, 0) * np.maximum(0.6 - xa[:, 1], 0)
        + 0.5 * np.maximum(xa[:, 2] - 0.5, 0)
        + 1.0
    )
    s1 = mars.fit(None, x, y, degree=1)
    s2 = mars.fit(None, x, y, degree=2)
    r2_1 = r2(y, mars.predict(s1, x))
    r2_2 = r2(y, mars.predict(s2, x))
    assert r2_2 > 0.995
    assert r2_2 > r2_1 + 0.01  # the interaction is not additively separable
    # degree-1 states: every pair hangs off the intercept
    assert np.all(np.asarray(s1.parent) == 0)
    # degree-2 structural invariants: parents reference earlier columns only,
    # and no term multiplies a variable by itself
    par = np.asarray(s2.parent)
    vs = np.asarray(s2.vars)
    act = np.asarray(s2.pair_active)
    for i in range(len(par)):
        if not act[i]:
            continue
        assert 0 <= par[i] <= 2 * i
        if par[i] > 0:
            j = (par[i] - 1) // 2  # pair that owns the parent column
            assert vs[j] != vs[i]
    assert (par[act.astype(bool)] > 0).any()  # it actually used a product term
    # importance counts the interaction for BOTH of its variables
    imp = mars.importance(s2, x, y, NAMES)
    assert imp["alt"]["rss"] > 1.0 and imp["slope"]["rss"] > 1.0


def test_mars_degree1_unchanged_by_degree_arg(rng):
    """The degree-1 path is the original code (golden-stable): fitting with
    the explicit default reproduces the pre-round-4 state exactly."""
    x, y = make_data(rng)
    a = mars.fit(None, x, y)
    b = mars.fit(None, x, y, degree=1)
    np.testing.assert_array_equal(np.asarray(a.vars), np.asarray(b.vars))
    np.testing.assert_array_equal(np.asarray(a.knots), np.asarray(b.knots))
    np.testing.assert_array_equal(np.asarray(a.coef), np.asarray(b.coef))


# --- gbm.step's low-traffic reference arguments (V73:1664-1670): offset,
# fold.vector, var.monotone — mltps never passes them (V73:247/493) but
# gbm.step exposes them; VERDICT r4 Missing #4.


def test_gbm_step_fold_vector(rng):
    """A user-supplied fold vector is honored verbatim (V73:1752-1756),
    in both R's 1-based and 0-based labelings; the reference's
    wrong-length error is raised."""
    x, y = make_data(rng, n=200)
    folds_r = (np.arange(200) % 5 + 1).astype(np.int32)   # R's 1..k labels
    kw = dict(tree_complexity=3, learning_rate=0.05, step_size=25,
              max_trees=200, n_folds=5)
    res = gbm_step.fit(jax.random.PRNGKey(3), x, y, fold_vector=folds_r, **kw)
    np.testing.assert_array_equal(res.selector, folds_r - 1)
    res0 = gbm_step.fit(jax.random.PRNGKey(3), x, y, fold_vector=folds_r - 1, **kw)
    np.testing.assert_array_equal(res0.selector, folds_r - 1)
    assert res0.best_trees == res.best_trees
    with pytest.raises(ValueError, match="wrong length"):
        gbm_step.fit(jax.random.PRNGKey(3), x, y, fold_vector=folds_r[:-1], **kw)
    with pytest.raises(ValueError, match="labels"):
        gbm_step.fit(
            jax.random.PRNGKey(3), x, y, fold_vector=folds_r + 5, **kw
        )


def test_gbm_step_offset_gaussian_equivalence(rng):
    """For gaussian, boosting y with a link-scale offset is EXACTLY boosting
    y - offset without one (same gradients, same trees under the same keys):
    best.trees match, fitted values differ by the offset, residuals match.
    Tolerance is pinned so the auto rule (0.001 x total deviance, which is
    offset-free by design, V73:1786-1796) can't decouple the two stoppings."""
    x, y = make_data(rng, n=250)
    off = jnp.asarray(0.5 * np.asarray(x)[:, 0] - 1.0)
    kw = dict(tree_complexity=3, learning_rate=0.05, step_size=25,
              max_trees=400, n_folds=5, tolerance=1e-4)
    key = jax.random.PRNGKey(11)
    res_off = gbm_step.fit(key, x, y, offset=off, **kw)
    res_shift = gbm_step.fit(key, x, y - off, **kw)
    assert res_off.best_trees == res_shift.best_trees
    np.testing.assert_allclose(
        res_off.fitted, np.asarray(res_shift.fitted) + np.asarray(off),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        res_off.residuals, res_shift.residuals, rtol=1e-5, atol=1e-5
    )
    # predict (like predict.gbm) excludes the offset: adding it by hand —
    # the reference's own idiom (V73:1845-1846) — recovers the fitted values
    np.testing.assert_allclose(
        np.asarray(gbm_step.predict(res_off, x)) + np.asarray(off),
        res_off.fitted, rtol=1e-4, atol=1e-4,
    )


def test_gbm_step_offset_f0_score_equations(rng):
    """f0_init with an offset solves each family's intercept score equation
    (gbm's C++ initF forms)."""
    from machisplin_tpu.models.families import f0_init

    n = 300
    w = jnp.asarray(rng.uniform(0.5, 2.0, n).astype(np.float32))
    off = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.3)
    yg = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    f0 = f0_init(yg, w, "gaussian", offset=off)
    assert abs(float(jnp.sum(w * (yg - (f0 + off))))) < 1e-3
    yp = jnp.asarray(rng.poisson(2.0, n).astype(np.float32))
    f0 = f0_init(yp, w, "poisson", offset=off)
    assert abs(float(jnp.sum(w * (yp - jnp.exp(f0 + off))))) < 1e-2
    yb = jnp.asarray((rng.uniform(size=n) < 0.3).astype(np.float32))
    f0 = f0_init(yb, w, "bernoulli", offset=off)
    p = 1.0 / (1.0 + jnp.exp(-(f0 + off)))
    assert abs(float(jnp.sum(w * (yb - p)))) < 1e-3


def test_brt_var_monotone(rng):
    """var.monotone semantics on a strictly increasing 1-feature response.
    On the FIRST tree the working response is strictly increasing, so +1
    masks nothing (identical tree to unconstrained) while -1 masks every
    candidate (no split anywhere; later trees see a constant gradient too,
    so the whole model is the constant f0).  Multi-tree +1 fits still learn
    the surface (masking only prunes candidates)."""
    n = 200
    x = jnp.asarray(np.linspace(0, 1, n, dtype=np.float32)[:, None])
    y = jnp.asarray(np.linspace(0, 2, n, dtype=np.float32))
    key = jax.random.PRNGKey(4)
    one = dict(n_trees=1, n_splits=3, lr=0.2, bag_fraction=1.0)
    up1 = brt.fit(key, x, y, var_monotone=jnp.asarray([1.0]), **one)
    free1 = brt.fit(key, x, y, **one)
    np.testing.assert_array_equal(np.asarray(up1.trees.thr), np.asarray(free1.trees.thr))
    np.testing.assert_allclose(
        np.asarray(up1.trees.value), np.asarray(free1.trees.value), rtol=1e-6
    )
    many = dict(n_trees=30, n_splits=3, lr=0.2, bag_fraction=1.0)
    up = brt.fit(key, x, y, var_monotone=jnp.asarray([1.0]), **many)
    assert r2(y, brt.predict(up, x)) > 0.8
    down = brt.fit(key, x, y, var_monotone=jnp.asarray([-1.0]), **many)
    assert np.all(np.asarray(down.trees.internal) == 0)   # no admissible split
    np.testing.assert_allclose(
        np.asarray(brt.predict(down, x)), float(down.f0), rtol=1e-5
    )


def test_gbm_step_var_monotone_threads_through(rng):
    """gbm_step.fit with a -1 constraint on the only informative predictor
    collapses to (near-)constant CV fits — the constraint reaches the CV
    grower, not just the final refit."""
    n = 200
    xr = rng.uniform(0, 1, (n, 2)).astype(np.float32)
    xr[:, 1] = 0.0                                        # dead feature
    y = jnp.asarray(np.sort(rng.standard_normal(n)).astype(np.float32))
    x = jnp.asarray(np.stack([np.sort(xr[:, 0]), xr[:, 1]], axis=1))
    res = gbm_step.fit(
        jax.random.PRNGKey(9), x, y,
        var_monotone=jnp.asarray([-1.0, 0.0]),
        tree_complexity=2, learning_rate=0.1, step_size=25, max_trees=100,
        n_folds=4, tolerance=1e-6,
    )
    spread = float(np.ptp(np.asarray(res.fitted)))
    assert spread < 0.05 * float(np.ptp(np.asarray(y)))
