"""Model registry + Spark orchestration.

The registry maps model names to per-series pandas forecast workers
(models/base.py protocol). ``run_model`` fans one model out across all
series with ONE ``groupBy(series_id).applyInPandas`` stage;
``run_all_models`` unions the per-model prediction frames. Scoring
joins predictions back to actuals Spark-side (J1) and aggregates with
the oracle-checked metric expressions (A6-A9) — model math lives in
workers, data-flow math lives in Catalyst.

Scale: series are hash-partitioned by series_id; each worker holds one
series (the reference's whole-dataset footprint) in memory. Millions
of series → embarrassingly parallel. Grids/folds are evaluated inside
the worker because a single candidate fit is an O(n·k²) lstsq —
cheaper than a task round-trip by orders of magnitude.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import partial

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from auto_ts_spark.functions import metrics as MET
from auto_ts_spark.models import ar as AR
from auto_ts_spark.models import fourier as FOUR
from auto_ts_spark.models import stats as STATS
from auto_ts_spark.models import var_model as VARM
from auto_ts_spark.models.base import expanding_fold_bounds

PRED_SCHEMA = "series_id string, ts timestamp, fold int, yhat double"


def model_registry(
    *, seasonal_period: int = 12, exog_cols: list[str] | None = None
) -> dict[str, Callable]:
    """Per-series forecast workers, keyed by reference model family:
    'fourier' ≈ Prophet, 'seasonal_ar' ≈ (auto-)SARIMAX, 'var' ≈ VAR.
    The ML family is Spark-side (models/ml.py), not a worker."""
    return {
        "fourier": partial(
            FOUR.forecast_fourier,
            seasonal_period=seasonal_period,
            exog_cols=exog_cols,
        ),
        "seasonal_ar": partial(
            AR.forecast_seasonal_ar, seasonal_period=seasonal_period
        ),
        "var": partial(VARM.forecast_var, exog_cols=exog_cols),
    }


def run_model(
    df: DataFrame,
    worker: Callable,
    *,
    n_splits: int,
    horizon: int,
    target: str = "y",
) -> DataFrame:
    """One applyInPandas pass: (series_id, ts, fold, yhat) rows."""

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.rename(columns={target: "y"}).sort_values("ts")
        folds = expanding_fold_bounds(len(pdf), n_splits, horizon)
        out = worker(pdf, folds, horizon)
        out.insert(0, "series_id", pdf["series_id"].iloc[0])
        return out[["series_id", "ts", "fold", "yhat"]]

    return df.groupBy("series_id").applyInPandas(apply_fn, PRED_SCHEMA)


def run_all_models(
    df: DataFrame,
    *,
    n_splits: int = 3,
    horizon: int = 8,
    target: str = "y",
    seasonal_period: int = 12,
    exog_cols: list[str] | None = None,
    models: list[str] | None = None,
) -> DataFrame:
    """All (series × model) fits in ONE applyInPandas stage.

    The model axis is fanned out by exploding a literal array and
    grouping on (series_id, model) — one scan and one shuffle total,
    instead of one full job per model family. The shuffle carries each
    series once per model (the per-series frame is the unit of work
    anyway); on a cluster this packs #series × #models independent
    tasks into a single stage, which AQE sizes as one unit.
    """
    reg = model_registry(seasonal_period=seasonal_period, exog_cols=exog_cols)
    names = models or list(reg)

    def apply_fn(key, pdf):  # no hints: (key, pdf) form is inferred by arity
        series_id, name = key
        worker = reg[name]
        pdf = pdf.rename(columns={target: "y"}).sort_values("ts")
        folds = expanding_fold_bounds(len(pdf), n_splits, horizon)
        out = worker(pdf, folds, horizon)
        out.insert(0, "series_id", series_id)
        out["model"] = name
        return out[["series_id", "ts", "fold", "yhat", "model"]]

    fan = df.withColumn("_model", F.explode(F.array(*[F.lit(n) for n in names])))
    return fan.groupBy("series_id", "_model").applyInPandas(
        apply_fn, PRED_SCHEMA + ", model string"
    )


def score_predictions(
    preds: DataFrame, actuals: DataFrame, *, target: str = "y"
) -> DataFrame:
    """J1 + A6-A9: join CV test predictions to actuals, score per
    (model, series_id, fold)."""
    joined = preds.filter(F.col("fold") >= 0).join(
        actuals.select("series_id", "ts", F.col(target).alias("y")),
        ["series_id", "ts"],
    )
    return joined.groupBy("model", "series_id", "fold").agg(
        MET.rmse(F.col("y"), F.col("yhat")).alias("rmse"),
        MET.mae(F.col("y"), F.col("yhat")).alias("mae"),
        F.count(F.lit(1)).alias("n_test"),
    )


def leaderboard(scores: DataFrame) -> DataFrame:
    """A9 + O1/O5: mean CV RMSE per model, ranked ascending."""
    from pyspark.sql import Window

    board = scores.groupBy("model").agg(
        F.avg("rmse").alias("mean_rmse"),
        F.avg("mae").alias("mean_mae"),
        F.count(F.lit(1)).alias("n_folds"),
    )
    w = Window.orderBy(F.col("mean_rmse").asc(), F.col("model"))
    return board.withColumn("rank", F.row_number().over(w))


def adf_table(df: DataFrame, *, target: str = "y") -> DataFrame:
    """W16 as a per-series applyInPandas: ADF statistic, stationarity
    decision, auto-diff order."""

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        y = pdf.sort_values("ts")[target].to_numpy(dtype=float)
        stat = STATS.adf_statistic(y)
        return pd.DataFrame(
            {
                "series_id": [pdf["series_id"].iloc[0]],
                "adf_stat": [round(stat, 6)],
                "crit_5pct": [STATS.ADF_CRIT["5%"]],
                "stationary": [bool(stat < STATS.ADF_CRIT["5%"])],
                "diff_order": [STATS.auto_diff_order(y)],
            }
        )

    return df.groupBy("series_id").applyInPandas(
        apply_fn,
        "series_id string, adf_stat double, crit_5pct double, stationary boolean, diff_order int",
    )
