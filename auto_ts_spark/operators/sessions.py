"""Sessionization — gap-based session assignment over an event stream.

Not in the reference (batch-only, single series), but a standard
time-series operator this engine needs at scale (and the batch twin of
Structured Streaming's ``session_window``): a new session starts when
the gap to the previous event of the same user exceeds ``gap``.

Classic two-window formulation: lag(ts) → gap flag → running sum of
flags = session index. Both windows share the same
(user, ts) partitioning/ordering, so Catalyst plans ONE shuffle and
one sort for the whole operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap_seconds: int,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Append a ``session_id`` (0-based per user) column."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col))
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_flag = (
        F.when(prev_ts.isNull(), F.lit(0))
        .when(
            F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_seconds,
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    running = Window.partitionBy(user_col).orderBy(F.col(ts_col)).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("session_id", F.sum(new_flag).over(running))


def session_stats(
    df: DataFrame,
    gap_seconds: int,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user session summary: session count, mean events/session,
    mean session duration in seconds."""
    s = sessionize(df, gap_seconds, user_col=user_col, ts_col=ts_col)
    per_session = s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).alias("duration_s"),
    )
    return per_session.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("n_events"), 6).alias("avg_events_per_session"),
        F.round(F.avg("duration_s"), 6).alias("avg_session_duration_s"),
    )
