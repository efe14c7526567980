"""Analytic parity invariants — R-parity made falsifiable WITHOUT an R host.

The north-star target "matches fields::Tps / gbm.step semantics" cannot be
asserted against recorded R numbers in this container (no R runtime;
tools/r_parity.R remains the runbook).  These tests pin the same semantics
against *mathematics* instead: properties any correct thin-plate smoothing
spline with GCV must satisfy exactly (null-space reproduction, the
interpolation limit, eff_df monotonicity and limits, the linear-smoother
leave-one-out identity) and the reference's gbm.step stopping arithmetic
computed by hand (V73:1957-1983).  Each test fails under seeded perturbation
of the corresponding fit path (they assert exact identities or tight
quantitative agreements, not loose statistics).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from machisplin_tpu.ops import tps_factor, tps_solve, tps_fit, tps_predict
from machisplin_tpu.ops.tps import gcv_curve
from machisplin_tpu.models.gbm_step import best_trees_from_curve, stopping_fired


def _coords(rng, n):
    return jnp.asarray(rng.uniform(0.0, 1.0, (n, 2)), jnp.float64)


# --------------------------------------------------------------------------
# TPS null space: data lying in span{1, x, y} is reproduced EXACTLY at any
# smoothing level — the roughness penalty is zero on the polynomial null
# space (fields::Tps m=2, d=2 semantics, V73:722/751), so the spline must
# pass through such data regardless of lambda.
# --------------------------------------------------------------------------
@pytest.mark.parametrize("lam", [1e-8, 1.0, 1e6])
def test_nullspace_reproduced_exactly_at_any_lambda(rng, lam):
    n = 64
    coords = _coords(rng, n)
    y = 3.5 - 2.0 * coords[:, 0] + 0.75 * coords[:, 1]
    model = tps_fit(coords, y, lam=lam)
    np.testing.assert_allclose(np.asarray(model.fitted), np.asarray(y),
                               rtol=0, atol=1e-9)
    # all signal is carried by the polynomial part: radial coefficients = 0
    assert float(jnp.abs(model.c).max()) < 1e-9
    # and the spline reproduces the polynomial AWAY from the knots too
    q = _coords(np.random.default_rng(7), 33)
    want = 3.5 - 2.0 * q[:, 0] + 0.75 * q[:, 1]
    np.testing.assert_allclose(np.asarray(tps_predict(model, q)),
                               np.asarray(want), rtol=0, atol=1e-8)


# --------------------------------------------------------------------------
# lambda -> 0 is the interpolation limit: fitted -> y, eff_df -> n.
# --------------------------------------------------------------------------
def test_interpolation_limit(rng):
    n = 48
    coords = _coords(rng, n)
    y = jnp.sin(4 * coords[:, 0]) * jnp.cos(3 * coords[:, 1]) + 0.2 * coords[:, 0]
    model = tps_fit(coords, y, lam=1e-14)
    np.testing.assert_allclose(np.asarray(model.fitted), np.asarray(y),
                               rtol=0, atol=1e-6)
    assert abs(float(model.eff_df) - n) < 1e-3


# --------------------------------------------------------------------------
# eff_df(lambda) = tr A(lambda) is strictly decreasing in lambda with limits
# n (lambda -> 0) and 3 = dim span{1,x,y} (lambda -> inf).
# --------------------------------------------------------------------------
def test_eff_df_monotone_with_correct_limits(rng):
    n = 40
    coords = _coords(rng, n)
    y = jnp.sin(5 * coords[:, 0]) + coords[:, 1] ** 2
    factor = tps_factor(coords)
    lams = 10.0 ** np.arange(-12, 7)
    effs = [float(tps_solve(factor, y, lam=l).eff_df) for l in lams]
    assert all(a > b for a, b in zip(effs, effs[1:])), effs
    assert abs(effs[0] - n) < 1e-3
    assert abs(effs[-1] - 3.0) < 1e-3


# --------------------------------------------------------------------------
# gcv_curve against an INDEPENDENT dense-hat-matrix re-derivation: build the
# smoother A(rho) = I - rho Q2 (Q2' K Q2 + rho I)^-1 Q2' from scratch in f64
# numpy (same range scaling, kernel, null basis — none of the package's
# eigen machinery) and check V(rho) = n ||(I-A) y||^2 / tr(I-A)^2 matches.
# --------------------------------------------------------------------------
def test_gcv_curve_matches_dense_hat_matrix(rng):
    n = 36
    coords = np.asarray(_coords(rng, n))
    y = np.sin(6 * coords[:, 0]) + 0.5 * coords[:, 1] + 0.05 * rng.standard_normal(n)

    lo, hi = coords.min(axis=0), coords.max(axis=0)
    x = (coords - lo) / (hi - lo)
    dx = x[:, 0][:, None] - x[:, 0][None, :]
    dy = x[:, 1][:, None] - x[:, 1][None, :]
    r2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        k = np.where(r2 > 0, 0.5 * r2 * np.log(np.maximum(r2, 1e-300)), 0.0)
    t = np.column_stack([np.ones(n), x])
    q, _ = np.linalg.qr(t, mode="complete")
    q2 = q[:, 3:]

    rhos = 10.0 ** np.arange(-8, 5)
    direct = np.empty_like(rhos)
    for i, rho in enumerate(rhos):
        inner = np.linalg.solve(q2.T @ k @ q2 + rho * np.eye(n - 3), q2.T)
        i_minus_a = rho * (q2 @ inner)
        rss = float(((i_minus_a @ y) ** 2).sum())
        tr = float(np.trace(i_minus_a))
        direct[i] = n * rss / tr**2

    got = np.asarray(gcv_curve(tps_factor(jnp.asarray(coords)), jnp.asarray(y),
                               jnp.asarray(rhos)))
    np.testing.assert_allclose(got, direct, rtol=1e-8)


# --------------------------------------------------------------------------
# The linear-smoother leave-one-out identity: refitting n times with point i
# excluded and predicting at point i must equal (y_i - f_i) / (1 - A_ii)
# computed from ONE full fit's dense hat matrix.  This exercises the whole
# masked-factorisation + prediction path end to end — any error in the
# factorisation, the mask algebra, or tps_predict breaks the identity.
# --------------------------------------------------------------------------
def test_leave_one_out_identity_and_gcv_minimum(rng):
    n = 42
    coords = np.asarray(_coords(rng, n))
    truth = np.sin(4 * coords[:, 0]) * np.cos(2 * coords[:, 1])
    y = truth + 0.15 * rng.standard_normal(n)
    cj = jnp.asarray(coords)
    yj = jnp.asarray(y)

    lo, hi = coords.min(axis=0), coords.max(axis=0)
    x = (coords - lo) / (hi - lo)
    dxm = x[:, 0][:, None] - x[:, 0][None, :]
    dym = x[:, 1][:, None] - x[:, 1][None, :]
    r2 = dxm * dxm + dym * dym
    with np.errstate(divide="ignore", invalid="ignore"):
        k = np.where(r2 > 0, 0.5 * r2 * np.log(np.maximum(r2, 1e-300)), 0.0)
    t = np.column_stack([np.ones(n), x])
    q, _ = np.linalg.qr(t, mode="complete")
    q2 = q[:, 3:]

    # the identity requires the SAME objective after deletion; tps_factor
    # rescales coordinates by the active range, so restrict the deletions to
    # points that are not coordinate extremes (deleting an extreme changes
    # the range scaling, hence the kernel and penalty — a different spline)
    extreme = set()
    for d in range(2):
        extreme.add(int(np.argmin(coords[:, d])))
        extreme.add(int(np.argmax(coords[:, d])))
    interior = [i for i in range(n) if i not in extreme]

    lam_grid = 10.0 ** np.arange(-7, 1)
    loo_refit = np.empty_like(lam_grid)
    loo_identity = np.empty_like(lam_grid)
    for g, lam in enumerate(lam_grid):
        rho = lam * n  # fields lambda = rho / n_active (full fit)
        inner = np.linalg.solve(q2.T @ k @ q2 + rho * np.eye(n - 3), q2.T)
        i_minus_a = rho * (q2 @ inner)
        f = y - i_minus_a @ y
        a_diag = 1.0 - np.diag(i_minus_a)
        r_loo = (y - f) / (1.0 - a_diag)
        loo_identity[g] = float((r_loo[interior] ** 2).sum())

        # literal refits: mask out point i (n_active = n-1, so the rho
        # matching THIS lam must be divided accordingly)
        errs = []
        for i in interior:
            mask = np.ones(n)
            mask[i] = 0.0
            m = tps_fit(cj, yj, mask=jnp.asarray(mask), lam=rho / (n - 1))
            errs.append(float(tps_predict(m, cj[i : i + 1])[0]) - y[i])
        loo_refit[g] = float((np.asarray(errs) ** 2).sum())
    np.testing.assert_allclose(loo_refit, loo_identity, rtol=1e-6)

    # GCV-selected lambda agrees with the direct LOO curve's minimiser:
    # within one grid step in log10(lambda), and its LOO score is within 5%
    # of the LOO optimum (GCV approximates A_ii by tr(A)/n, so the minima
    # coincide approximately, not exactly).
    model = tps_fit(cj, yj)  # GCV-selected
    lam_gcv = float(model.lam)
    i_loo = int(np.argmin(loo_refit))
    assert abs(np.log10(lam_gcv) - np.log10(lam_grid[i_loo])) <= 1.0 + 1e-9, (
        lam_gcv, lam_grid[i_loo])
    loo_at_gcv = np.interp(np.log10(lam_gcv), np.log10(lam_grid), loo_refit)
    assert loo_at_gcv <= 1.05 * loo_refit[i_loo]


# --------------------------------------------------------------------------
# gbm.step stopping-window fixture: the 10-vs-11 OVERLAPPING window
# arithmetic (V73:1957-1961) checked against numbers computed by hand.
# --------------------------------------------------------------------------
def test_stopping_window_paper_arithmetic():
    # strictly decreasing by 1 per checkpoint, 20 checkpoints: curve 20..1.
    #   test1 = mean(curve[10:20]) = mean(10, 9, ..., 1)  = 5.5
    #   test2 = mean(curve[0:11])  = mean(20, 19, ..., 10) = 15.0
    #   delta = 9.5  -> fires only when tolerance >= 9.5
    curve = np.arange(20, 0, -1, dtype=float)
    assert not stopping_fired(curve, tolerance=9.4999)
    assert stopping_fired(curve, tolerance=9.5)

    # the windows OVERLAP at checkpoint j-9 (11 values in test2, 10 in
    # test1): a single spike at exactly that overlap index enters BOTH
    # windows.  flat curve = 1.0 with curve[10] = 12.0 (the overlap slot):
    #   test1 = (12 + 9*1)/10 = 2.1 ; test2 = (10*1 + 12)/11 = 2.0
    #   delta = -0.1  -> fires even at tolerance 0 (deviance "rose")
    spiked = np.ones(20)
    spiked[10] = 12.0
    assert stopping_fired(spiked, tolerance=0.0)
    # a NON-overlapping 10/10 window split would instead give
    # test2 - test1 = 1.0 - 2.1 = -1.1; pin the overlap semantics by the
    # exact delta via tolerance bracketing around -0.1
    assert not stopping_fired(spiked, tolerance=-0.1001)
    assert stopping_fired(spiked, tolerance=-0.0999)

    # not armed before 2*win checkpoints exist
    assert not stopping_fired(np.ones(19), tolerance=1e9)

    # vector form: per-chain tolerances
    curves = np.stack([curve, np.ones(20)], axis=1)          # (20, 2)
    fired = stopping_fired(curves, tolerance=np.array([9.5, -0.1]))
    assert fired.tolist() == [True, False]


def test_best_trees_argmin_fixture():
    # first checkpoint attaining the min (V73:1978-1983), scaled by step
    curve = np.array([5.0, 3.0, 2.0, 2.0, 4.0, np.inf])
    assert best_trees_from_curve(curve, stopped=5, step_size=50) == 150
    # stopping truncates the eligible prefix
    assert best_trees_from_curve(curve, stopped=2, step_size=50) == 100
    assert best_trees_from_curve(curve, stopped=1, step_size=25) == 25


# --------------------------------------------------------------------------
# A real tiny gbm.step run at step_size=1 is self-consistent with the
# extracted rule: the recorded holdout curve + stopping_fired reproduce
# trees_fitted, and best_trees is the argmin over the grown prefix.
# --------------------------------------------------------------------------
def test_gbm_step_stopping_self_consistent(rng):
    from machisplin_tpu.models import gbm_step

    n = 80
    x = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    y = jnp.asarray(
        np.sin(3 * np.asarray(x[:, 0])) + np.asarray(x[:, 1])
        + 0.1 * rng.standard_normal(n),
        jnp.float32,
    )
    res = gbm_step.fit(
        jax.random.PRNGKey(3), x, y,
        tree_complexity=2, learning_rate=0.05, n_folds=4,
        step_size=1, max_trees=60, min_leaf=3.0,
    )
    j = res.trees_fitted  # checkpoints grown (step_size=1)
    curve = np.asarray(res.cv_deviance[:j], np.float64)
    assert np.isfinite(curve).all()
    tol = 0.001 * float(res.self_statistics["mean.null"])

    # replay the while_loop's stopping decision from the recorded curve
    fired_at = next(
        (ncp for ncp in range(20, j + 1) if stopping_fired(curve[:ncp], tol)),
        None,
    )
    if j < 60:  # stopped by the window rule, not the max_trees budget
        assert fired_at == j, (fired_at, j)
    else:
        assert fired_at is None or fired_at == j
    assert res.best_trees == best_trees_from_curve(curve, j, 1)
