"""Multi-series leaderboard scale probe: N series x 200 daily rows
through the full CV leaderboard (run_all_models -> score_predictions
-> leaderboard) in ONE applyInPandas stage, measuring series-fits/sec
and confirming driver work stays flat as the series count grows 10x.

Extends the r5 5k-series probe (BASELINE.md) one order of magnitude:
50k series x 200 rows = 10M rows, 150k (series x model x fold) fits.

Usage: python tools/probe_leaderboard_scale.py [n_series ...]
  default: 5000 50000
Prints one JSON line per scale.
"""

from __future__ import annotations

import json
import sys
import time

import os

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_series(spark, n_series: int, n_rows: int = 200):
    """Deterministic synthetic daily panel, built distributed: the
    driver ships only (series_id) seeds; rows materialize executor-side
    via sequence+explode so a 10M-row panel never sits on the driver."""
    from pyspark.sql import functions as F

    sdf = spark.range(n_series).select(
        F.concat(F.lit("s"), F.col("id")).alias("series_id"),
        F.col("id").alias("_seed"),
    )
    rows = sdf.select(
        "series_id",
        "_seed",
        F.explode(F.sequence(F.lit(0), F.lit(n_rows - 1))).alias("_t"),
    )
    # trend + weekly seasonality + hash-noise, all codegen expressions
    return rows.select(
        "series_id",
        F.expr("date_add(date '2023-01-01', _t)").cast("timestamp").alias("ts"),
        (
            F.col("_seed") % 50
            + F.col("_t") * 0.1
            + F.sin(F.col("_t") * (2 * np.pi / 7)) * 3.0
            + (F.hash("series_id", "_t") % 1000) / 500.0
        ).alias("y"),
    )


def probe(spark, n_series: int, models: list[str]) -> dict:
    from pyspark.sql import functions as F

    from auto_ts_spark.models.registry import (
        leaderboard,
        run_all_models,
        score_predictions,
    )

    df = make_series(spark, n_series).repartition(64, "series_id")
    t0 = time.perf_counter()
    preds = run_all_models(
        df, n_splits=2, horizon=8, seasonal_period=7, models=models
    )
    scores = score_predictions(preds, df)
    lb = leaderboard(scores)
    n_rows = lb.count()
    wall = time.perf_counter() - t0
    n_fits = n_series * len(models) * 2  # series x model x fold
    return {
        "n_series": n_series,
        "models": models,
        "n_fits": n_fits,
        "wall_s": round(wall, 1),
        "fits_per_sec": round(n_fits / wall),
        "leaderboard_rows": n_rows,
    }


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [5_000, 50_000]
    from auto_ts_spark import get_spark

    spark = get_spark("probe_leaderboard_scale")
    models = ["fourier", "seasonal_ar", "var"]
    probe(spark, 200, models)  # warmup: worker imports + codegen
    for n in sizes:
        print(json.dumps(probe(spark, n, models)), flush=True)
    spark.stop()
