"""Exported-ensemble predictor: the driver/worker-local tree walk must
reproduce Spark ML's own transform, and the one-job grouped recursion
must equal the driver-loop recursion series for series."""

import numpy as np
import pandas as pd

from auto_ts_spark.models import ml as ML
from auto_ts_spark.models.tree_export import export_ensemble, predict_rows


def _series(n=96, seed=1, sid="0"):
    rng = np.random.RandomState(seed)
    t = np.arange(n, dtype=float)
    y = 10 + 0.5 * t + 8 * np.sin(2 * np.pi * t / 12) + rng.randn(n) * 0.5
    return pd.DataFrame(
        {
            "series_id": sid,
            "ts": pd.date_range("2015-01-31", periods=n, freq="ME"),
            "y": y,
        }
    )


def test_exported_predictor_matches_transform(spark):
    df = spark.createDataFrame(_series())
    feat, cols = ML.build_features(df)
    assembler, model = ML.fit_gbt(feat, cols)
    ens = export_ensemble(model)
    sample = model.transform(assembler.transform(feat)).select(*cols, "prediction")
    rows = sample.limit(50).collect()
    want = [r["prediction"] for r in rows]
    got = predict_rows(ens, [r.asDict() for r in rows], cols)
    assert np.allclose(got, want, atol=1e-9), (
        np.max(np.abs(np.array(got) - np.array(want)))
    )


def test_grouped_forecast_equals_driver_loop(spark):
    both = spark.createDataFrame(pd.concat([_series(seed=1, sid="a"), _series(seed=2, sid="b")]))
    feat, cols = ML.build_features(both)
    fitted = (*ML.fit_gbt(feat, cols), cols)

    driver = ML.recursive_forecast_ml(both, 5, fitted=fitted)
    grouped = ML.forecast_ml_grouped(both, 5, fitted=fitted).toPandas()
    assert len(grouped) == len(driver) == 10
    d = driver.sort_values(["series_id", "ts"]).reset_index(drop=True)
    g = grouped.sort_values(["series_id", "ts"]).reset_index(drop=True)
    assert list(g["series_id"]) == list(d["series_id"])
    assert list(pd.to_datetime(g["ts"])) == list(pd.to_datetime(d["ts"]))
    assert np.allclose(g["yhat"].to_numpy(), d["yhat"].to_numpy(), atol=1e-9)
