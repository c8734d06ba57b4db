"""ML forecaster — Spark-native re-expression of the reference's
XGBoost pipeline (auto_ts/models/build_ml.py:88-414, M8/M9/M13).

Pipeline: lag matrix (W1) + calendar features (W8) → Spark ML
``GBTRegressor`` (the container's gradient-boosted trees; swap for
SparkXGBRegressor where available) → expanding-window CV scored with
one-step-ahead (teacher-forced) lag features → final refit → h-step
recursive forecast.

The recursion (M13/W15) is inherently sequential: h driver-side
micro-predictions over a pandas tail, exactly like the reference's
one-row-at-a-time loop — but bounded (reference floors h at 5), and
the per-step predict runs on a 1-row frame.

Unlike the per-series numpy workers, training is Spark-distributed:
on one series it uses all executors for tree building; per-series
models at scale would instead pivot to the fourier/AR workers.
"""

from __future__ import annotations

import pandas as pd
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import GBTRegressor
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from auto_ts_spark.functions.calendar import add_calendar_features
from auto_ts_spark.operators.folds import with_row_number
from auto_ts_spark.operators.lags import supervised_lag_matrix

CAL_FEATURES = ("month", "quarter", "dayofweek", "weekend", "dayofmonth")


def build_features(
    df: DataFrame, target: str = "y", *, lags: int = 3, exog_cols: list[str] | None = None
) -> tuple[DataFrame, list[str]]:
    value_cols = [target] + list(exog_cols or [])
    feat = supervised_lag_matrix(df, value_cols, n_in=lags)
    feat = add_calendar_features(feat, "ts", CAL_FEATURES)
    feature_cols = [f"{c}_lag_{i}" for c in value_cols for i in range(1, lags + 1)]
    feature_cols += [f"ts_{f}" for f in CAL_FEATURES]
    return feat, feature_cols


def fit_gbt(
    train: DataFrame,
    feature_cols: list[str],
    target: str = "y",
    *,
    max_iter: int = 40,
    max_depth: int = 5,
    seed: int = 99,
):
    """Assemble + fit; seed pinned like the reference (seed=99,
    build_ml.py:191)."""
    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features")
    gbt = GBTRegressor(
        labelCol=target,
        featuresCol="features",
        maxIter=max_iter,
        maxDepth=max_depth,
        stepSize=0.1,
        seed=seed,
    )
    assembled = assembler.transform(train)
    return assembler, gbt.fit(assembled)


def feature_importances(model, feature_cols: list[str]) -> pd.DataFrame:
    """O3 (auto_ts/models/ml_models.py:159-176): ranked feature
    importances of a fitted tree ensemble. The reference sorts the
    XGBoost importance series descending and keeps the top 10; here the
    vector comes from Spark ML's ``featureImportances`` (impurity
    gain, normalized to sum 1)."""
    imp = model.featureImportances
    rows = [
        {"feature": feature_cols[i], "importance": float(imp[i])}
        for i in range(len(feature_cols))
    ]
    out = pd.DataFrame(rows).sort_values(
        ["importance", "feature"], ascending=[False, True]
    )
    out["rank"] = range(1, len(out) + 1)
    return out.reset_index(drop=True)


def cv_scores_ml(
    df: DataFrame,
    *,
    target: str = "y",
    lags: int = 3,
    n_splits: int = 3,
    horizon: int = 8,
    exog_cols: list[str] | None = None,
) -> pd.DataFrame:
    """Expanding-window CV: per fold, train on the prefix, score the
    next ``horizon`` rows (one-step-ahead features). Returns a small
    pandas frame (model, fold, rmse, n_test)."""
    feat, feature_cols = build_features(df, target, lags=lags, exog_cols=exog_cols)
    feat = with_row_number(feat).cache()
    n = feat.count()
    rows = []
    for fold in range(n_splits):
        train_end = n - (n_splits - fold) * horizon
        if train_end < max(10, len(feature_cols)):
            continue
        train = feat.filter(F.col("rn") <= train_end)
        test = feat.filter(
            (F.col("rn") > train_end) & (F.col("rn") <= train_end + horizon)
        )
        assembler, model = fit_gbt(train, feature_cols, target)
        pred = model.transform(assembler.transform(test))
        agg = pred.agg(
            F.sqrt(F.avg(F.pow(F.col(target) - F.col("prediction"), 2))).alias("rmse"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        rows.append(("ml_gbt", fold, float(agg["rmse"]), int(agg["n"])))
    feat.unpersist()
    return pd.DataFrame(rows, columns=["model", "fold", "rmse", "n_test"])


def recursive_forecast_ml(
    df: DataFrame,
    horizon: int,
    *,
    target: str = "y",
    lags: int = 3,
    exog_cols: list[str] | None = None,
) -> pd.DataFrame:
    """M13: refit on all data, then h sequential one-step predictions,
    each feeding its yhat back into the lag window (driver-side pandas
    tail; the model itself was trained distributed)."""
    feat, feature_cols = build_features(df, target, lags=lags, exog_cols=exog_cols)
    assembler, model = fit_gbt(feat, feature_cols, target)
    spark = df.sparkSession

    tail = (
        df.orderBy(F.col("ts").desc())
        .limit(lags + 1)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    freq_s = (
        (tail["ts"].iloc[-1] - tail["ts"].iloc[0]).total_seconds() / max(len(tail) - 1, 1)
        if len(tail) > 1
        else 86400.0
    )
    exog_cols = list(exog_cols or [])
    out = []
    for step in range(horizon):
        next_ts = tail["ts"].iloc[-1] + pd.Timedelta(seconds=freq_s)
        new_row = {"series_id": tail["series_id"].iloc[0], "ts": next_ts, target: 0.0}
        for c in exog_cols:  # persistence for unknown future exog
            new_row[c] = tail[c].iloc[-1]
        window = pd.concat([tail, pd.DataFrame([new_row])], ignore_index=True)
        sdf = spark.createDataFrame(window)
        f, _ = build_features(sdf, target, lags=lags, exog_cols=exog_cols)
        last = f.orderBy(F.col("ts").desc()).limit(1)
        pred = model.transform(assembler.transform(last)).select("prediction").collect()
        yhat = float(pred[0][0]) if pred else float(tail[target].iloc[-1])
        out.append({"ts": next_ts, "fold": -1, "yhat": yhat})
        new_row[target] = yhat
        tail = pd.concat([tail, pd.DataFrame([new_row])], ignore_index=True).iloc[1:]
    return pd.DataFrame(out)
