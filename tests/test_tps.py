"""TPS solver tests: exact interpolation vs scipy's thin-plate RBF golden,
polynomial reproduction, smoothing/GCV behavior, masked-padding exactness,
and multi-response batching (reference semantics: fields::Tps at V73:722/751)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import RBFInterpolator

from machisplin_tpu.grid import GridSpec
from machisplin_tpu.ops.tps import (
    gcv_curve,
    tps_factor,
    tps_fit,
    tps_predict,
    tps_predict_grid,
    tps_solve,
)


def make_points(rng, n=60):
    """Random points in the unit square with corners pinned so the per-dim
    range scaling is exactly isotropic (TPS interpolants are invariant under
    isotropic scaling, enabling the scipy comparison)."""
    pts = rng.uniform(0, 1, size=(n, 2))
    pts[0] = (0.0, 0.0)
    pts[1] = (1.0, 1.0)
    return pts


def test_exact_interpolation_matches_scipy(rng):
    pts = make_points(rng)
    y = np.sin(3 * pts[:, 0]) + np.cos(2 * pts[:, 1]) + 0.3 * pts[:, 0] * pts[:, 1]
    model = tps_fit(jnp.asarray(pts), jnp.asarray(y), lam=0.0)
    # interpolates the data
    np.testing.assert_allclose(np.asarray(tps_predict(model, pts)), y, atol=1e-5)
    # matches the classic thin-plate interpolant (radial + degree-1 polynomial
    # null space) away from the knots
    golden = RBFInterpolator(pts, y, kernel="thin_plate_spline", smoothing=0.0, degree=1)
    test_pts = rng.uniform(0.1, 0.9, size=(40, 2))
    ours = np.asarray(tps_predict(model, test_pts))
    theirs = golden(test_pts)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_polynomial_reproduction(rng):
    pts = make_points(rng)
    y = 2.0 + 3.0 * pts[:, 0] - 1.5 * pts[:, 1]
    # a linear field is in the null space: reproduced exactly at ANY lambda
    for lam in (0.0, 1e-3, 1.0):
        model = tps_fit(jnp.asarray(pts), jnp.asarray(y), lam=lam)
        test_pts = rng.uniform(-0.5, 1.5, size=(30, 2))
        got = np.asarray(tps_predict(model, test_pts))
        want = 2.0 + 3.0 * test_pts[:, 0] - 1.5 * test_pts[:, 1]
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_residual_identity_and_df(rng):
    pts = make_points(rng, n=80)
    y = np.sin(5 * pts[:, 0]) + 0.1 * rng.standard_normal(80)
    model = tps_fit(jnp.asarray(pts), jnp.asarray(y), lam=1e-4)
    fitted = np.asarray(tps_predict(model, pts))
    np.testing.assert_allclose(np.asarray(model.fitted), fitted, atol=1e-6)
    np.testing.assert_allclose(np.asarray(model.residuals), y - fitted, atol=1e-6)
    # effective df shrinks as lambda grows; floor is the 3 polynomial terms
    df = [float(tps_fit(jnp.asarray(pts), jnp.asarray(y), lam=l).eff_df) for l in (1e-6, 1e-3, 1e1)]
    assert df[0] > df[1] > df[2]
    assert df[2] >= 3.0 - 1e-6


def test_gcv_selects_reasonable_lambda(rng):
    pts = make_points(rng, n=150)
    truth = np.sin(4 * pts[:, 0]) * np.cos(3 * pts[:, 1])
    y = truth + 0.05 * rng.standard_normal(150)
    model = tps_fit(jnp.asarray(pts), jnp.asarray(y))
    # GCV-smoothed fit should be closer to the noiseless truth than exact interpolation
    exact = tps_fit(jnp.asarray(pts), jnp.asarray(y), lam=0.0)
    test_pts = rng.uniform(0.05, 0.95, size=(200, 2))
    t = np.sin(4 * test_pts[:, 0]) * np.cos(3 * test_pts[:, 1])
    err_gcv = np.mean((np.asarray(tps_predict(model, test_pts)) - t) ** 2)
    err_exact = np.mean((np.asarray(tps_predict(exact, test_pts)) - t) ** 2)
    assert err_gcv < err_exact
    # and the chosen lambda is the argmin of the GCV curve
    factor = tps_factor(jnp.asarray(pts))
    rho_grid = jnp.logspace(-9, 4, 400)
    curve = np.asarray(gcv_curve(factor, jnp.asarray(y), rho_grid))
    assert float(model.gcv) <= curve.min() * (1 + 1e-6)


def test_masked_padding_is_exact(rng):
    """Padding knots with the mask must reproduce the dense sub-fit exactly:
    same GCV lambda, same predictions."""
    pts = make_points(rng, n=50)
    y = np.sin(3 * pts[:, 0]) + 0.1 * rng.standard_normal(50)
    dense = tps_fit(jnp.asarray(pts), jnp.asarray(y))

    pad = 30
    pts_p = np.concatenate([pts, rng.uniform(5, 6, size=(pad, 2))])
    y_p = np.concatenate([y, np.zeros(pad)])
    mask = np.concatenate([np.ones(50), np.zeros(pad)])
    padded = tps_fit(jnp.asarray(pts_p), jnp.asarray(y_p), mask=jnp.asarray(mask))

    np.testing.assert_allclose(float(padded.lam), float(dense.lam), rtol=1e-5)
    test_pts = rng.uniform(0.1, 0.9, size=(40, 2))
    np.testing.assert_allclose(
        np.asarray(tps_predict(padded, test_pts)),
        np.asarray(tps_predict(dense, test_pts)),
        rtol=1e-6, atol=1e-8,
    )


def test_multi_response_matches_loop(rng):
    pts = make_points(rng, n=70)
    ys = np.stack(
        [np.sin(3 * pts[:, 0]) + 0.1 * rng.standard_normal(70) for _ in range(3)],
        axis=1,
    )
    factor = tps_factor(jnp.asarray(pts))
    batched = tps_solve(factor, jnp.asarray(ys))
    test_pts = rng.uniform(0.1, 0.9, size=(25, 2))
    got = np.asarray(tps_predict(batched, test_pts))
    assert got.shape == (25, 3)
    for j in range(3):
        single = tps_solve(factor, jnp.asarray(ys[:, j]))
        np.testing.assert_allclose(float(batched.lam[j]), float(single.lam), rtol=1e-6)
        np.testing.assert_allclose(
            got[:, j], np.asarray(tps_predict(single, test_pts)), rtol=1e-6, atol=1e-9
        )


def test_grid_prediction_matches_pointwise(rng):
    pts = make_points(rng, n=40)
    y = np.cos(4 * pts[:, 0] * pts[:, 1])
    model = tps_fit(jnp.asarray(pts), jnp.asarray(y), lam=1e-5)
    grid = GridSpec(nrows=17, ncols=23, xmin=0.0, ymax=1.0, dx=1 / 23, dy=1 / 17)
    surf = np.asarray(tps_predict_grid(model, grid, block_rows=5, use_pallas=False))
    assert surf.shape == (17, 23)
    xs, ys_ = np.asarray(grid.x_coords(jnp.float64)), np.asarray(grid.y_coords(jnp.float64))
    check = np.stack(np.meshgrid(xs, ys_, indexing="xy"), axis=-1).reshape(-1, 2)
    want = np.asarray(tps_predict(model, check)).reshape(17, 23)
    np.testing.assert_allclose(surf, want, atol=1e-8)


def test_float32_path_works(rng):
    """The on-TPU dtype: fit + predict in f32 keeps R^2 accuracy."""
    pts = make_points(rng, n=200).astype(np.float32)
    truth = np.sin(4 * pts[:, 0]) * np.cos(3 * pts[:, 1])
    y = (truth + 0.02 * rng.standard_normal(200)).astype(np.float32)
    model = tps_fit(jnp.asarray(pts), jnp.asarray(y))
    pred = np.asarray(tps_predict(model, pts))
    r2 = 1 - np.sum((y - pred) ** 2) / np.sum((y - y.mean()) ** 2)
    assert pred.dtype == np.float32
    assert r2 > 0.98


def test_fit_is_jittable(rng):
    pts = jnp.asarray(make_points(rng, n=30))
    y = jnp.asarray(np.sin(pts[:, 0] * 3))
    fit = jax.jit(lambda p, v: tps_fit(p, v, lam=1e-4))
    model = fit(pts, y)
    assert np.isfinite(np.asarray(model.c)).all()


def test_host_solver_matches_device(rng):
    from machisplin_tpu.ops.host_tps import tps_fit_host

    pts = make_points(rng, n=80)
    y = np.sin(3 * pts[:, 0]) + 0.1 * rng.standard_normal(80)
    dev = tps_fit(jnp.asarray(pts), jnp.asarray(y))
    host = tps_fit_host(pts, y)
    np.testing.assert_allclose(float(host.lam), float(dev.lam), rtol=1e-3)
    test_pts = rng.uniform(0.1, 0.9, size=(50, 2))
    np.testing.assert_allclose(
        np.asarray(tps_predict(host, test_pts)),
        np.asarray(tps_predict(dev, test_pts)),
        rtol=1e-5, atol=1e-7,
    )


def test_pairwise_r2_no_expansion_cancellation():
    """_pairwise_r2 must stay accurate for clustered points far from the
    origin.  The |a|^2+|b|^2-2ab' matmul expansion loses essentially all
    precision here in f32 (and is bfloat16-truncated at TPU default matmul
    precision) — the root cause of the round-1 "TPS correction made R^2
    worse" regression — so the implementation uses explicit differences."""
    from machisplin_tpu.ops.tps import _pairwise_r2

    rng = np.random.default_rng(7)
    base = np.array([12.345, -67.89])
    a = (base + 1e-3 * rng.standard_normal((50, 2))).astype(np.float32)
    b = (base + 1e-3 * rng.standard_normal((40, 2))).astype(np.float32)
    got = np.asarray(_pairwise_r2(jnp.asarray(a), jnp.asarray(b)))
    want = ((a[:, None, :].astype(np.float64) - b[None, :, :].astype(np.float64)) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_tps_fit_auto_scale_policy(rng):
    """Round-4 (VERDICT next #5): tps_fit_auto's written scale policy —
    exact dense factorisation up to the device-eigh ceiling, Nyström
    reduced basis beyond it by default, method='exact' forcing the f64
    host path at any n (on every backend, round-3 ADVICE), and a loud
    error for the unsupported mask."""
    import pytest

    from machisplin_tpu.ops.tps import tps_fit, tps_fit_auto, tps_predict

    coords = rng.uniform(0, 1, (120, 2))
    y = np.stack([
        np.sin(3 * coords[:, 0]) + 0.05 * rng.standard_normal(120),
        np.cos(2 * coords[:, 1]) + 0.05 * rng.standard_normal(120),
    ], axis=1)
    dev = tps_fit(jnp.asarray(coords), jnp.asarray(y))
    pts = jnp.asarray(rng.uniform(0.05, 0.95, (40, 2)))

    # below the ceiling auto IS the exact device fit
    small = tps_fit_auto(jnp.asarray(coords), jnp.asarray(y), max_device_knots=1000)
    np.testing.assert_allclose(np.asarray(small.c), np.asarray(dev.c), rtol=1e-6)

    # above the ceiling auto routes to the Nyström reduced basis ...
    nys = tps_fit_auto(
        jnp.asarray(coords), jnp.asarray(y), max_device_knots=50, landmarks=64
    )
    assert nys.knots.shape[0] == 64  # landmark basis, not the full knot set
    np.testing.assert_allclose(
        np.asarray(tps_predict(nys, pts)), np.asarray(tps_predict(dev, pts)),
        rtol=0.05, atol=0.05,
    )

    # ... and method='exact' forces the f64 host factorisation instead
    host = tps_fit_auto(
        jnp.asarray(coords), jnp.asarray(y), max_device_knots=50, method="exact"
    )
    assert host.knots.shape[0] == 120
    np.testing.assert_allclose(
        np.asarray(tps_predict(host, pts)), np.asarray(tps_predict(dev, pts)),
        rtol=1e-3, atol=1e-4,
    )

    with pytest.raises(ValueError, match="dense rows only"):
        tps_fit_auto(jnp.asarray(coords), jnp.asarray(y), mask=jnp.ones(120))
    with pytest.raises(ValueError, match="unknown method"):
        tps_fit_auto(jnp.asarray(coords), jnp.asarray(y), method="bogus")
