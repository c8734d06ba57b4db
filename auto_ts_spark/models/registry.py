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
    *,
    seasonal_period: int = 12,
    exog_cols: list[str] | None = None,
    fourier_config: dict | None = None,
    var_config: dict | None = None,
) -> dict[str, Callable]:
    """Per-series forecast workers, keyed by reference model family:
    'fourier' ≈ Prophet, 'seasonal_ar' ≈ (auto-)SARIMAX, 'var' ≈ VARMA.
    The ML family is Spark-side (models/ml.py), not a worker.

    ``fourier_config`` forwards the Prophet configuration surface
    (growth/cap/seasonality_mode/holidays/seasonal_periods — reference
    build_prophet.py:70-80, 587-649) into the fourier worker.
    ``var_config`` forwards the VARMA grid bounds (``max_p``/``max_q``
    — reference BuildVAR(p_max, q_max), build_var.py:32-47; pass
    ``max_q=0`` to pin pure VAR(p))."""
    return {
        "fourier": partial(
            FOUR.forecast_fourier,
            seasonal_period=seasonal_period,
            exog_cols=exog_cols,
            **(fourier_config or {}),
        ),
        "seasonal_ar": partial(
            AR.forecast_seasonal_ar,
            seasonal_period=seasonal_period,
            exog_cols=exog_cols,
        ),
        "var": partial(
            VARM.forecast_var, exog_cols=exog_cols, **(var_config or {})
        ),
    }


def run_model(
    df: DataFrame,
    worker: Callable,
    *,
    n_splits: int,
    horizon: int,
    target: str = "y",
) -> DataFrame:
    """One applyInPandas pass: (series_id, ts, fold, yhat) rows.

    Rows flagged ``_future = 1`` (predict-on-unseen: future timestamps
    + known exog, y unused) are split out of the group and handed to
    the worker as its future frame — they travel WITH the series
    through the same shuffle, so unseen-data scoring costs no extra
    join or stage."""

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf, fut = _split_future(pdf.rename(columns={target: "y"}))
        if not len(pdf):
            return pd.DataFrame(columns=["series_id", "ts", "fold", "yhat"])
        folds = expanding_fold_bounds(len(pdf), n_splits, horizon)
        out = worker(pdf, folds, horizon) if fut is None else worker(
            pdf, folds, horizon, future_pdf=fut
        )
        out.insert(0, "series_id", pdf["series_id"].iloc[0])
        return out[["series_id", "ts", "fold", "yhat"]]

    return df.groupBy("series_id").applyInPandas(apply_fn, PRED_SCHEMA)


def _split_future(pdf: pd.DataFrame) -> tuple[pd.DataFrame, pd.DataFrame | None]:
    """Split a grouped frame into (observed, future-or-None) on the
    optional ``_future`` flag column."""
    if "_future" not in pdf.columns:
        return pdf.sort_values("ts"), None
    fut = pdf[pdf["_future"] == 1].sort_values("ts")
    obs = pdf[pdf["_future"] != 1].sort_values("ts")
    return obs, (fut if len(fut) else None)


def run_all_models(
    df: DataFrame,
    *,
    n_splits: int = 3,
    horizon: int = 8,
    target: str = "y",
    seasonal_period: int = 12,
    exog_cols: list[str] | None = None,
    models: list[str] | None = None,
    fourier_config: dict | None = None,
    var_config: dict | None = None,
) -> DataFrame:
    """All (series × model) fits in ONE applyInPandas stage.

    The model axis is fanned out by exploding a literal array and
    grouping on (series_id, model) — one scan and one shuffle total,
    instead of one full job per model family. The shuffle carries each
    series once per model (the per-series frame is the unit of work
    anyway); on a cluster this packs #series × #models independent
    tasks into a single stage, which AQE sizes as one unit.
    """
    reg = model_registry(
        seasonal_period=seasonal_period,
        exog_cols=exog_cols,
        fourier_config=fourier_config,
        var_config=var_config,
    )
    names = models or list(reg)

    def apply_fn(key, pdf):  # no hints: (key, pdf) form is inferred by arity
        series_id, name = key
        worker = reg[name]
        pdf, fut = _split_future(pdf.rename(columns={target: "y"}))
        if not len(pdf):
            return pd.DataFrame(columns=["series_id", "ts", "fold", "yhat", "model"])
        folds = expanding_fold_bounds(len(pdf), n_splits, horizon)
        out = worker(pdf, folds, horizon) if fut is None else worker(
            pdf, folds, horizon, future_pdf=fut
        )
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
    (model, series_id, fold).

    The actuals side is the caller's FULL input panel — at scale never
    broadcastable — but compile-time size estimates for generated
    inputs (range → sequence/explode pipelines keep the tiny pre-
    explode estimate) can claim it is: the r9 500k-series probe had
    Spark try to broadcast a 100M-row panel and OOM the driver. The
    merge hint pins a shuffle plan at compile time; AQE's RUNTIME
    stats (which are exact) still convert to broadcast when a side is
    genuinely small, so small panels lose nothing."""
    joined = preds.filter(F.col("fold") >= 0).join(
        actuals.select("series_id", "ts", F.col(target).alias("y")).hint("merge"),
        ["series_id", "ts"],
    )
    return joined.groupBy("model", "series_id", "fold").agg(
        MET.rmse(F.col("y"), F.col("yhat")).alias("rmse"),
        MET.mae(F.col("y"), F.col("yhat")).alias("mae"),
        F.count(F.lit(1)).alias("n_test"),
        MET.rmse_normalized_by_std(F.col("y"), F.col("yhat")).alias("nrmse"),
    )


def leaderboard(scores: DataFrame, *, metric: str = "rmse") -> DataFrame:
    """A9 + O1/O5: mean CV score per model, ranked ascending by the
    chosen metric — the reference's ``score_type`` knob
    (auto_ts/__init__.py:74-77): 'rmse' or 'normalized_rmse' (RMSE /
    std of the fold's actuals, metrics.py A8)."""
    from pyspark.sql import Window

    rank_col = {"rmse": "mean_rmse", "normalized_rmse": "mean_nrmse"}[metric]
    aggs = [
        F.avg("rmse").alias("mean_rmse"),
        F.avg("mae").alias("mean_mae"),
        F.count(F.lit(1)).alias("n_folds"),
    ]
    if "nrmse" in scores.columns:
        aggs.append(F.avg("nrmse").alias("mean_nrmse"))
    elif metric != "rmse":
        raise ValueError("scores frame has no nrmse column for normalized_rmse ranking")
    from auto_ts_spark.operators.partitioning import bounded_window_key

    board = scores.groupBy("model").agg(*aggs)
    # declared single-partition rank over this bounded (≤ #models
    # rows) frame — see bounded_window_key for why lit(1) is not enough
    w = Window.partitionBy(bounded_window_key("model")).orderBy(
        F.col(rank_col).asc_nulls_last(), F.col("model")
    )
    board = board.withColumn("rank", F.row_number().over(w))
    return board.select("model", "mean_rmse", "mean_mae", "n_folds", "rank")


def with_prediction_intervals(
    preds: DataFrame,
    actuals: DataFrame,
    *,
    target: str = "y",
    z: float = 1.96,
) -> DataFrame:
    """Attach ``mean_se`` / ``yhat_lower`` / ``yhat_upper`` to the
    final-forecast rows (fold == -1) from each (model, series)'s CV
    residual spread — the Spark analogue of the reference's interval
    columns (build_ml.py:674-680, build_arima_base.py:310-369: the
    reference pulls se/ci from statsmodels' forecast object; here the
    spread is the empirical out-of-fold residual std, the model-free
    estimator that works for every family).

    Join strategy (r9): both joins are pinned to shuffle plans at
    compile time and left to AQE's exact runtime stats to up-convert
    to broadcast when a side is genuinely small. The actuals panel is
    never broadcastable at scale but generated inputs can carry tiny
    compile-time size estimates (the 500k-series probe OOM), and
    ``resid`` is a per-(model, series) aggregate — it GROWS with the
    series count (1.5M rows at 500k series × 3 models), so a forced
    broadcast is a scale ceiling, not an optimization."""
    resid = (
        preds.filter(F.col("fold") >= 0)
        .join(
            actuals.select(
                "series_id", "ts", F.col(target).alias("_y")
            ).hint("merge"),
            ["series_id", "ts"],
        )
        .groupBy("model", "series_id")
        .agg(F.stddev_samp(F.col("_y") - F.col("yhat")).alias("mean_se"))
    )
    fut = preds.filter(F.col("fold") == -1).join(
        resid.hint("merge"), ["model", "series_id"], "left"
    )
    return fut.select(
        "model",
        "series_id",
        "ts",
        "fold",
        "yhat",
        "mean_se",
        (F.col("yhat") - F.lit(z) * F.col("mean_se")).alias("yhat_lower"),
        (F.col("yhat") + F.lit(z) * F.col("mean_se")).alias("yhat_upper"),
    )


def adf_table(df: DataFrame, *, target: str = "y") -> DataFrame:
    """W16 as a per-series applyInPandas: ADF statistic, stationarity
    decision, auto-diff order."""

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        y = pdf.sort_values("ts")[target].to_numpy(dtype=float)
        res = STATS.adf_test(y)
        return pd.DataFrame(
            {
                "series_id": [pdf["series_id"].iloc[0]],
                "adf_stat": [round(res["stat"], 6)],
                "crit_5pct": [round(res["crit_5pct"], 6)],
                "stationary": [res["stationary"]],
                "diff_order": [STATS.auto_diff_order(y)],
            }
        )

    return df.groupBy("series_id").applyInPandas(
        apply_fn,
        "series_id string, adf_stat double, crit_5pct double, stationary boolean, diff_order int",
    )
