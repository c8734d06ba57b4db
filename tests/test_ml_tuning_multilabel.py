"""M9 boost-round tuning (temporal-holdout analogue of xgb.cv early
stopping) + multi-label targets (MultiOutput per-output decomposition,
reference __init__.py:281-291, ml_models.py:302-322)."""

import numpy as np
import pandas as pd
import pytest

from auto_ts_spark.models import ml as ML


def _series(n=90, seed=1):
    rng = np.random.RandomState(seed)
    t = np.arange(n, dtype=float)
    return pd.DataFrame(
        {
            "series_id": "0",
            "ts": pd.date_range("2018-01-31", periods=n, freq="ME"),
            "y": 10 + 0.5 * t + 8 * np.sin(2 * np.pi * t / 12) + rng.randn(n) * 0.5,
            "y2": 40 - 0.2 * t + 3 * np.cos(2 * np.pi * t / 12) + rng.randn(n) * 0.5,
        }
    )


@pytest.mark.slow
def test_tune_gbt_max_iter(spark):
    sdf = spark.createDataFrame(_series().drop(columns=["y2"]))
    best, trials = ML.tune_gbt_max_iter(
        sdf, candidates=(5, 40), holdout=8
    )
    assert best in (5, 40)
    assert set(trials["max_iter"]) == {5, 40}
    assert (trials["rmse"] > 0).all()
    # the chosen candidate is the trial argmin
    assert best == int(trials.sort_values(["rmse", "max_iter"]).iloc[0]["max_iter"])


@pytest.mark.slow
def test_ml_tune_wired_into_facade(spark):
    from auto_ts_spark.auto import AutoTimeSeries

    pdf = _series().drop(columns=["series_id", "y2"])
    ats = AutoTimeSeries(
        forecast_period=4, n_splits=2, model_type="ml", ml_tune=True
    )
    ats.fit(spark.createDataFrame(pdf), "ts", "y")
    assert ats.ml_trials_ is not None and len(ats.ml_trials_) == 4
    assert ats.ml_max_iter_ in set(ats.ml_trials_["max_iter"])


def test_tune_short_series_falls_back(spark):
    """Series shorter than holdout + min-train must not crash or fit
    on zero rows — the tuner returns the default (round-3 review
    finding: previously all rows landed in validation)."""
    sdf = spark.createDataFrame(_series(n=10).drop(columns=["y2"]))
    best, trials = ML.tune_gbt_max_iter(sdf, candidates=(5, 40), holdout=8)
    assert best == 40
    assert len(trials) == 0


@pytest.mark.slow
def test_multi_label_path_input_drops_siblings(spark, tmp_path):
    """A parquet path input must behave exactly like a DataFrame
    input: sibling targets dropped, never leaked into exog features
    (round-3 review finding)."""
    from auto_ts_spark.auto import AutoTimeSeries

    pdf = _series().drop(columns=["series_id"])
    p = str(tmp_path / "multi.parquet")
    spark.createDataFrame(pdf).repartition(1).write.parquet(p, mode="overwrite")
    ats = AutoTimeSeries(forecast_period=4, n_splits=2, model_type="prophet")
    ats.fit(p + "/", "ts", ["y", "y2"])
    for t, sub in ats.multi_.items():
        sibling = "y2" if t == "y" else "y"
        assert sibling not in sub.exog_cols_, (t, sub.exog_cols_)
        assert sub.exog_cols_ == []


@pytest.mark.slow
def test_multi_label_fit_predict(spark):
    from auto_ts_spark.auto import AutoTimeSeries

    pdf = _series().drop(columns=["series_id"])
    ats = AutoTimeSeries(forecast_period=4, n_splits=2, model_type="prophet")
    ats.fit(spark.createDataFrame(pdf), "ts", ["y", "y2"])
    board = ats.get_leaderboard()
    assert set(board["target"]) == {"y", "y2"}
    out = ats.predict().toPandas()
    assert set(out["target"]) == {"y", "y2"}
    assert len(out) == 8  # 4 steps × 2 targets
    # per-target forecasts equal the single-target runs
    solo = AutoTimeSeries(forecast_period=4, n_splits=2, model_type="prophet")
    solo.fit(spark.createDataFrame(pdf.drop(columns=["y2"])), "ts", "y")
    a = out[out["target"] == "y"].sort_values("ts")["yhat"].to_numpy()
    b = solo.predict().toPandas().sort_values("ts")["yhat"].to_numpy()
    assert np.allclose(a, b)
