"""R-parity assertions — the python half of the BASELINE north-star loop.

tools/r_parity.R (run on any R-equipped machine) records deterministic
``fields::Tps`` outputs on the bundled station data into tools/r_parity.json;
when that file is present these tests close the "matches R to 1e-5 in R^2"
loop directly.  Without it they skip — the pinned-seed statistical goldens
(tests/test_goldens.py) remain the regression net in this container.

What is asserted and why:

* fitted R^2 to 1e-5 — the BASELINE metric, invariant to kernel scaling;
* eff.df (equivalent degrees of freedom) to 0.5% — pins the GCV lambda
  selection itself, also scaling-invariant;
* fitted values at the first 20 stations to 1e-2 of the response spread
  (atol = 1e-2 x sd, plus rtol 1e-3) — pins the solved surface, not just
  its summary, while leaving room for the f32-device vs f64-fields
  accumulation gap at bio_12's ~1e3 response scale;
* raw lambda is NOT compared: fields' radial basis carries a constant
  factor relative to phi(r) = r^2 log r, which rescales lambda while
  leaving the fit identical.
"""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

JSON_PATH = os.path.join(os.path.dirname(__file__), "..", "tools", "r_parity.json")


@pytest.fixture(scope="module")
def r_golden():
    if not os.path.exists(JSON_PATH):
        pytest.skip("tools/r_parity.json not present (run tools/r_parity.R under R)")
    with open(JSON_PATH) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def station_fits():
    from machisplin_tpu.data import load_sampling
    from machisplin_tpu.ops.host_tps import tps_fit_host
    from machisplin_tpu.ops.tps import tps_predict

    d = load_sampling()
    coords = np.stack([d["long"], d["lat"]], axis=1)
    out = {}
    for col in ("bio_1", "bio_12"):
        y = np.asarray(d[col], np.float64)
        model = tps_fit_host(coords, y)          # f64, deterministic
        pred = np.asarray(tps_predict(model, jnp.asarray(coords)))
        r2 = 1 - np.sum((y - pred) ** 2) / np.sum((y - y.mean()) ** 2)
        out[col] = {
            "r2": float(r2),
            "eff_df": float(np.asarray(model.eff_df)),
            "fitted_head": pred[:20],
        }
    return out


@pytest.mark.parametrize("col", ["bio_1", "bio_12"])
def test_tps_r2_matches_fields_to_1e5(r_golden, station_fits, col):
    want = r_golden["tps"][col]["r2_fitted"]
    got = station_fits[col]["r2"]
    assert abs(got - want) < 1e-5, f"{col}: R^2 {got} vs fields {want}"


@pytest.mark.parametrize("col", ["bio_1", "bio_12"])
def test_tps_eff_df_matches_fields(r_golden, station_fits, col):
    want = r_golden["tps"][col]["eff_df"]
    got = station_fits[col]["eff_df"]
    assert got == pytest.approx(want, rel=5e-3), f"{col}: eff.df {got} vs {want}"


@pytest.mark.parametrize("col", ["bio_1", "bio_12"])
def test_tps_fitted_values_match_fields(r_golden, station_fits, col):
    want = np.asarray(r_golden["tps"][col]["fitted_head"], np.float64)
    got = station_fits[col]["fitted_head"]
    scale = np.std(want) + 1e-12
    # 1e-2 of the response spread + 1e-3 relative (module docstring)
    np.testing.assert_allclose(got, want, atol=1e-2 * scale, rtol=1e-3)
