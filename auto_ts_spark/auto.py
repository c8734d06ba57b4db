"""AutoTimeSeries — the engine facade, mirroring the reference's
``auto_timeseries`` orchestrator (auto_ts/__init__.py:202-1008):
fit → leaderboard → predict, with the same model-family vocabulary,
returning DataFrames instead of matplotlib sessions.

Differences by design (SURVEY.md §7.3):
- every stage is a Spark DataFrame op or an applyInPandas worker, so
  the same fit() call scales from one 48-row series to millions of
  series (the input carries ``series_id``);
- model families are deterministic numpy re-expressions (fourier ≈
  Prophet, seasonal_ar ≈ SARIMAX, var ≈ VAR) plus Spark-ML GBT
  (≈ the XGBoost path);
- stationarity analysis (W16) is reported per series, not applied
  destructively to shared state (reference quirk noted in SURVEY §3.1
  step 3 — intentional deviation).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from auto_ts_spark.io.sources import load_ts
from auto_ts_spark.models import ml as ML
from auto_ts_spark.models import registry as REG
from auto_ts_spark.operators.future import infer_frequency, seasonal_period

WORKER_MODELS = ("fourier", "seasonal_ar", "var")


class AutoTimeSeries:
    """fit/predict/leaderboard over a canonical (series_id, ts, y,
    exog...) DataFrame."""

    def __init__(
        self,
        *,
        forecast_period: int = 8,
        n_splits: int = 3,
        model_type: str | list[str] = "best",
        seasonal_period: int | None = None,
        lags: int = 3,
    ) -> None:
        self.forecast_period = max(forecast_period, 1)
        self.n_splits = n_splits
        self.model_type = model_type
        self.seasonal_period_override = seasonal_period
        self.lags = lags
        self.freq_: str | None = None
        self.m_: int | None = None
        self.scores_: DataFrame | None = None
        self.leaderboard_: pd.DataFrame | None = None
        self.predictions_: DataFrame | None = None
        self.ml_cv_: pd.DataFrame | None = None
        self.train_df_: DataFrame | None = None
        self.exog_cols_: list[str] = []
        self.target_: str = "y"

    # ------------------------------------------------------------ fit

    def _model_names(self) -> list[str]:
        if self.model_type == "best":
            return list(WORKER_MODELS) + ["ml_gbt"]
        names = (
            [self.model_type] if isinstance(self.model_type, str) else list(self.model_type)
        )
        alias = {
            "prophet": "fourier",
            "sarimax": "seasonal_ar",
            "auto_sarimax": "seasonal_ar",
            "arima": "seasonal_ar",
            "ml": "ml_gbt",
            "stats": "seasonal_ar",
        }
        return [alias.get(n.lower(), n.lower()) for n in names]

    def fit(
        self,
        traindata: DataFrame | str,
        ts_column: str,
        target: str,
        *,
        sep: str = ",",
        series_id: str | None = None,
    ) -> "AutoTimeSeries":
        spark = (
            traindata.sparkSession
            if isinstance(traindata, DataFrame)
            else None
        )
        if spark is None:
            from auto_ts_spark.session import get_spark

            spark = get_spark("auto_ts")
        df = load_ts(
            spark, traindata, ts_column, target, sep=sep, series_id=series_id
        )
        df = df.withColumnRenamed(target, "y")
        self.target_ = target
        self.exog_cols_ = [
            c
            for c, t in df.dtypes
            if c not in ("series_id", "ts", "y")
            and t in ("int", "bigint", "double", "float", "smallint", "tinyint")
        ]
        self.train_df_ = df.cache()
        self.freq_ = infer_frequency(df)
        self.m_ = self.seasonal_period_override or seasonal_period(self.freq_)

        names = self._model_names()
        worker_names = [n for n in names if n in WORKER_MODELS]
        preds_parts: list[DataFrame] = []
        if worker_names:
            preds = REG.run_all_models(
                df,
                n_splits=self.n_splits,
                horizon=self.forecast_period,
                seasonal_period=self.m_,
                exog_cols=self.exog_cols_,
                models=worker_names,
            )
            preds_parts.append(preds)
        if "ml_gbt" in names:
            self.ml_cv_ = ML.cv_scores_ml(
                df,
                lags=self.lags,
                n_splits=self.n_splits,
                horizon=self.forecast_period,
                exog_cols=self.exog_cols_,
            )
            ml_future = ML.recursive_forecast_ml(
                df,
                self.forecast_period,
                lags=self.lags,
                exog_cols=self.exog_cols_,
            )
            sid = df.select("series_id").first()[0]
            ml_future.insert(0, "series_id", sid)
            ml_preds = spark.createDataFrame(
                ml_future[["series_id", "ts", "fold", "yhat"]]
            ).withColumn("model", F.lit("ml_gbt"))
            preds_parts.append(ml_preds)

        all_preds = preds_parts[0]
        for p in preds_parts[1:]:
            all_preds = all_preds.unionByName(p)
        self.predictions_ = all_preds.cache()

        scores = REG.score_predictions(self.predictions_, df)
        if self.ml_cv_ is not None and len(self.ml_cv_):
            ml_scores = spark.createDataFrame(self.ml_cv_).select(
                "model",
                F.lit(df.select("series_id").first()[0]).alias("series_id"),
                "fold",
                F.col("rmse"),
                F.lit(None).cast("double").alias("mae"),
                F.col("n_test").cast("long"),
            )
            scores = scores.unionByName(ml_scores)
        self.scores_ = scores.cache()
        self.leaderboard_ = (
            REG.leaderboard(self.scores_).orderBy("rank").toPandas()
        )
        return self

    # ------------------------------------------------------ accessors

    def get_leaderboard(self) -> pd.DataFrame:
        if self.leaderboard_ is None:
            raise RuntimeError("call fit first")
        return self.leaderboard_

    def get_best_model_name(self) -> str:
        return str(self.get_leaderboard().iloc[0]["model"])

    def get_cv_scores(self) -> DataFrame:
        if self.scores_ is None:
            raise RuntimeError("call fit first")
        return self.scores_

    def stationarity_report(self) -> DataFrame:
        if self.train_df_ is None:
            raise RuntimeError("call fit first")
        return REG.adf_table(self.train_df_)

    # -------------------------------------------------------- predict

    def predict(self, model: str | None = None) -> DataFrame:
        """Final h-step forecast rows (fold == -1) for the chosen (or
        best) model: (series_id, ts, yhat)."""
        if self.predictions_ is None:
            raise RuntimeError("call fit first")
        name = model or self.get_best_model_name()
        return (
            self.predictions_.filter(
                (F.col("fold") == -1) & (F.col("model") == name)
            )
            .select("series_id", "ts", "yhat")
            .orderBy("series_id", "ts")
        )
