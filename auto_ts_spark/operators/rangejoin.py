"""Range (interval) join: points ⋈ intervals on containment.

The reference never joins on a time range (its merges are index-equi,
SURVEY.md §2.5); this is a scale extension for event-window analytics.

Naively, ``points JOIN intervals ON ts >= start AND ts < end`` has no
equi key, so Spark plans a BroadcastNestedLoopJoin / CartesianProduct —
O(|points| × |intervals|) comparisons, hopeless at 100 TB. The classic
fix (used by every distributed engine's interval join, e.g. Flink's
and Spark's own streaming interval join) is **bin bucketing**:

- each point maps to exactly ONE bin of width ``bin_seconds``;
- each interval explodes to the bins it overlaps;
- the join becomes an equi-join on bin (plus any caller equi keys),
  followed by the exact residual predicate.

Shuffle volume is linear: |points| + |intervals| × (avg interval width
/ bin width + 1). Pick ``bin_seconds`` ≈ the typical interval width so
intervals explode to ~2 bins each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "_rj_bin"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    start: str,
    end: str,
    bin_seconds: int,
    on: list[str] | None = None,
) -> DataFrame:
    """Inner-join ``points`` to every interval containing them:
    ``start <= point_ts < end`` (end exclusive), optionally also
    matching the equi-key columns ``on``.

    Column names must be disjoint apart from ``on`` — rename before
    calling. Intervals with ``end <= start`` are empty and dropped.
    """
    bw = int(bin_seconds) * 1_000_000  # micros; integer div keeps precision
    # cast() tolerates both TIMESTAMP and TIMESTAMP_NTZ sources (parquet
    # readers may infer either); both sides use the same cast, so bin
    # assignment stays consistent regardless of session timezone.
    def _micros(c: str) -> str:
        return f"unix_micros(cast(`{c}` as timestamp))"

    pb = points.withColumn(_BIN, F.expr(f"{_micros(point_ts)} div {bw}"))
    ib = intervals.filter(F.col(end) > F.col(start)).withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.expr(f"{_micros(start)} div {bw}"),
                # end is exclusive: the last candidate bin is the one
                # containing end - 1 micro
                F.expr(f"({_micros(end)} - 1) div {bw}"),
            )
        ),
    )
    keys = [_BIN] + list(on or [])
    j = pb.join(ib, on=keys, how="inner").filter(
        (F.col(point_ts) >= F.col(start)) & (F.col(point_ts) < F.col(end))
    )
    return j.drop(_BIN)
