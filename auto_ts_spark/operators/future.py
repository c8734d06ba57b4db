"""Time-axis utilities: frequency inference, seasonal period, future
index generation, forward-fill.

Reference parity (SURVEY.md §2.3):
- W6 frequency inference (auto_ts/__init__.py:399-453) → :func:`infer_frequency`
- W7 seasonal-period imputation (auto_ts/__init__.py:489-510) → :data:`SEASONAL_PERIODS`
- W11 future-index generation (auto_ts/models/build_prophet.py:256,418)
  → :func:`future_index`
- P3 forward-fill + missing flag (auto_ts/models/build_ml.py:716-720)
  → :func:`forward_fill`
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# freq code → seasonal period m (reference table, auto_ts/__init__.py:489-510)
SEASONAL_PERIODS: dict[str, int] = {
    "months": 12,
    "days": 30,
    "weeks": 52,
    "quarters": 4,
    "semi": 2,
    "hours": 24,
    "minutes": 60,
    "seconds": 60,
    "years": 1,
}

_FREQ_INTERVAL = {
    "seconds": "interval 1 second",
    "minutes": "interval 1 minute",
    "hours": "interval 1 hour",
    "days": "interval 1 day",
    "weeks": "interval 7 days",
    "months": "interval 1 month",
    "quarters": "interval 3 months",
    "semi": "interval 6 months",
    "years": "interval 1 year",
}


def infer_frequency(df: DataFrame, ts_col: str = "ts", series_col: str = "series_id") -> str:
    """Infer the series frequency from the delta of the first two
    timestamps (the reference's rule, auto_ts/__init__.py:399-453).

    Thresholds (delta in days): <1/24 by seconds/minutes; <1 hours;
    1 days; 7 weeks; 28-89 months; 89-178 quarters; 178-360 semi;
    >=360 years (the reference's exact bands, auto_ts/__init__.py:420-426).
    """
    w = Window.partitionBy(series_col).orderBy(F.col(ts_col))
    first_two = (
        df.select(series_col, ts_col)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .groupBy(series_col)
        .agg(
            (
                F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
            ).alias("delta_s")
        )
        .agg(F.min("delta_s").alias("delta_s"))
        .collect()
    )
    delta_s = first_two[0]["delta_s"] or 0
    day = 86400.0
    d = delta_s / day
    if delta_s < 60:
        return "seconds"
    if delta_s < 3600:
        return "minutes"
    if d < 1:
        return "hours"
    if d < 7:
        return "days"
    if d < 28:
        return "weeks"
    if d < 89:
        return "months"
    if d < 178:
        return "quarters"
    if d < 360:
        return "semi"
    return "years"


def seasonal_period(freq: str) -> int:
    return SEASONAL_PERIODS.get(freq, 1)


def future_index(
    df: DataFrame,
    periods: int,
    freq: str,
    *,
    ts_col: str = "ts",
    series_col: str = "series_id",
) -> DataFrame:
    """Generate ``periods`` future timestamps past each series' max ts.

    ``sequence(max_ts + Δ, max_ts + n·Δ, Δ)`` + ``explode`` — one agg +
    one generator, no driver loop; scales to millions of series.
    """
    step = _FREQ_INTERVAL[freq]
    return (
        df.groupBy(series_col)
        .agg(F.max(ts_col).alias("_max_ts"))
        .select(
            series_col,
            F.explode(
                F.expr(
                    f"sequence(_max_ts + {step}, _max_ts + {periods} * ({step}), {step})"
                )
            ).alias(ts_col),
        )
    )


def forward_fill(
    df: DataFrame,
    cols: list[str],
    *,
    order_col: str = "ts",
    series_col: str = "series_id",
    add_missing_flag: bool = True,
) -> DataFrame:
    """ffill nulls per series + optional ``{col}_missing_flag`` (P3).

    ``last(col, ignorenulls=True)`` over an unbounded-preceding row frame.
    """
    w = (
        Window.partitionBy(series_col)
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in cols:
        if add_missing_flag:
            out = out.withColumn(f"{c}_missing_flag", F.col(c).isNull().cast("int"))
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def resample_regular(
    df: DataFrame,
    value_cols: list[str],
    interval_seconds: int = 3600,
    *,
    ts_col: str = "ts",
    series_col: str = "series_id",
    fill: str = "ffill",
) -> DataFrame:
    """Resample each series onto a regular grid of ``interval_seconds``
    buckets, filling gaps (``fill``: 'ffill' carries the last
    observation, 'null' leaves holes, 'zero' inserts 0). The upsample
    counterpart of the rollup path — the reference handles only
    already-regular series; this makes irregular data regular first.
    Fixed-width intervals only (epoch math); calendar intervals
    (months) go through date_trunc rollups instead.

    Plan (r13 single-scan form): bucket = epoch-floor (one projection)
    → per-(series, bucket) averages (one agg) → per-series ordered
    window takes each bucket's successor → ``sequence()`` + ``explode``
    emits the bucket itself plus its gap rows (null values) directly —
    no second scan for the series bounds (the grid's first/last points
    are the min/max OBSERVED buckets, because the old
    ``sequence(floor(min_ts), max_ts)`` form is step-aligned and so
    also started/ended exactly there) and no grid⋈obs join — then the
    ffill window. One scan and two shuffles (agg + window) regardless
    of series count or gap density; gap rows never cross a shuffle
    (the explode runs above the window's exchange).
    """
    step = int(interval_seconds)
    bucket = F.timestamp_seconds(
        (F.floor(F.unix_timestamp(F.col(ts_col)) / step) * step).cast("bigint")
    )
    obs = df.groupBy(series_col, bucket.alias("_obs_ts")).agg(
        *[F.avg(c).alias(c) for c in value_cols]
    )
    w_next = Window.partitionBy(series_col).orderBy("_obs_ts")
    staged = obs.withColumn("_nxt", F.lead("_obs_ts").over(w_next))
    grid_seq = F.expr(
        f"sequence(_obs_ts, coalesce(_nxt - interval {step} seconds, _obs_ts), "
        f"interval {step} seconds)"
    )
    exploded = staged.select(
        series_col, "_obs_ts", *value_cols, F.explode(grid_seq).alias("_grid_ts")
    )
    joined = exploded.select(
        series_col,
        "_grid_ts",
        *[
            F.when(F.col("_grid_ts") == F.col("_obs_ts"), F.col(c)).alias(c)
            for c in value_cols
        ],
    )
    if fill == "ffill":
        w = (
            Window.partitionBy(series_col)
            .orderBy("_grid_ts")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        joined = joined.select(
            series_col,
            "_grid_ts",
            *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
        )
    elif fill == "zero":
        joined = joined.na.fill({c: 0 for c in value_cols})
    return joined.withColumnRenamed("_grid_ts", ts_col)
