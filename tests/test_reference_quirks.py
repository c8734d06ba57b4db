"""Intentional deviations from reference quirks (SURVEY.md §7.3(e)).

The reference's fit path mutates the shared frame when VAR is in the
candidate mix: with ``model_type`` containing var/stats/best it runs
``test_stationarity(ts_df, var_only=True)`` and then destructively
re-assigns ``ts_df = ts_df.diff().dropna()`` ``diff_limit - 1`` times
(``auto_ts/__init__.py:345-353``), so every LATER model family
(Prophet, ML) silently trains on the differenced data — an
order-of-registration side effect, not a modeling decision.

The new engine records this as an INTENTIONAL deviation: stationarity
handling is per-model — ``models/ar.py:538-565`` computes a leak-free
per-fold ``d_hint`` inside the SARIMAX worker, VAR conditions its own
design matrix, and no model ever sees another family's transform.
These tests pin the deviation so it stays deliberate: if someone
"fixes" the engine toward reference behavior (or introduces any other
cross-model frame mutation), they fail loudly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def trending(spark):
    """A strongly trended (non-stationary) multivariate series that
    makes the reference's diff_limit >= 2 — i.e., its destructive loop
    actually rewrites ts_df at least once."""
    n = 120
    ts = pd.date_range("2020-01-01", periods=n, freq="D")
    rng = np.random.RandomState(11)
    y = 100.0 + 2.0 * np.arange(n) + rng.randn(n).cumsum()
    x = 50.0 + 1.5 * np.arange(n) + rng.randn(n).cumsum()
    pdf = pd.DataFrame(
        {"series_id": "s1", "ts": ts, "y": y, "x": x}
    )
    return spark.createDataFrame(pdf)


def _yhats(df, models):
    from auto_ts_spark.models.registry import run_all_models

    preds = run_all_models(
        df, models=models, n_splits=2, horizon=4, seasonal_period=7
    )
    out = (
        preds.filter(F.col("model") != "var")
        .select("model", "series_id", "ts", "fold", "yhat")
        .toPandas()
        .sort_values(["model", "fold", "ts"])
        .reset_index(drop=True)
    )
    return out


def test_var_in_mix_does_not_leak_into_other_models(trending):
    """Reference: adding VAR to the mix changes what Prophet/ML see
    (ts_df is globally differenced first). New engine: each family is
    isolated, so the fourier forecasts are IDENTICAL with and without
    VAR in the same run."""
    alone = _yhats(trending, ["fourier"])
    with_var = _yhats(trending, ["fourier", "var"])
    pd.testing.assert_frame_equal(alone, with_var, check_like=False)


def test_forecasts_stay_on_original_scale(trending):
    """The reference's destructive loop would hand later models the
    differenced series (per-step deltas ~ 2), not the level series
    (~ 100-350). The engine's non-VAR forecasts must be on the LEVEL
    scale even when VAR runs in the same fan-out — the magnitude gap
    is two orders, so the assertion survives any model noise."""
    out = _yhats(trending, ["fourier", "seasonal_ar", "var"])
    assert not out.empty
    # every non-VAR forecast is level-scale (>> the ~2.0 delta scale)
    assert (out["yhat"].abs() > 50).all(), out["yhat"].describe()


def test_reference_loop_shape_documented():
    """Executable documentation of the quirk being deviated from:
    reproduce the reference's loop semantics in pandas (diff applied
    ``diff_limit - 1`` times — itself off-by-one-looking: diff_limit=1
    means NO differencing) and show the frame later models would see
    there is delta-scale, unlike the engine's (previous two tests)."""
    n = 120
    rng = np.random.RandomState(11)
    pdf = pd.DataFrame(
        {
            "y": 100.0 + 2.0 * np.arange(n) + rng.randn(n).cumsum(),
            "x": 50.0 + 1.5 * np.arange(n) + rng.randn(n).cumsum(),
        }
    )
    from auto_ts_spark.models.stats import auto_diff_order

    # reference: test_stationarity(..., var_only=True) -> diff_limit,
    # then `for i in range(1, diff_limit): ts_df = ts_df.diff().dropna()`
    diff_limit = max(
        auto_diff_order(pdf["y"].to_numpy()) + 1,
        auto_diff_order(pdf["x"].to_numpy()) + 1,
    )
    assert diff_limit >= 2  # the loop body actually runs on this data
    leaked = pdf.copy()
    for _ in range(1, diff_limit):
        leaked = leaked.diff().dropna()
    # the frame the reference would hand to later models is delta-scale
    assert leaked["y"].abs().median() < 10
    # ... while the original (what OUR engine hands every model) is not
    assert pdf["y"].abs().median() > 50
