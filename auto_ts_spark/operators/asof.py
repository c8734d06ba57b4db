"""As-of join — the canonical time-series join Spark has no native
operator for (reference has only index equi-joins, SURVEY.md §2.5; this
is a scale-extension operator every market-data / feature-store
pipeline needs).

Semantics: for each left row (key, ts), attach the latest right row
with ``right.ts <= left.ts`` (backward direction; optional tolerance).

Plan shape — the union trick, NOT a range join: tag both sides, union
(left payload rides along, right columns are NULL on left rows and
vice versa), one window sorted by (key, ts) with ``last(right_val,
ignorenulls=True)`` carries the most recent right observation forward
onto left rows. Cost is one shuffle on the key + one ordered window per
key — linear, no candidate-pair explosion, no inequality-join fallback
to nested loops, no re-join of the payload. This is how you as-of join
100 TB of ticks: the window state is one row per right column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from auto_ts_spark.operators.lags import cols_list


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: Sequence[str] = ("series_id",),
    right_cols: Sequence[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join of ``right`` onto ``left``.

    ``tolerance``: optional max staleness as an INTERVAL string (e.g.
    ``'2 hours'``) — matches older than that become NULL, like pandas
    ``merge_asof(tolerance=...)``.
    """
    # a bare string is a Sequence[str] too — wrap it so list("series_id")
    # can't silently explode into single-character column names
    by = cols_list(by)
    if right_cols is not None:
        right_cols = cols_list(right_cols)
    right_cols = [c for c in (right_cols or right.columns) if c not in by + [on]]
    left_payload = [c for c in left.columns if c not in by + [on]]
    r_types = dict(right.dtypes)
    l_types = dict(left.dtypes)

    l_tag = left.select(
        *by, F.col(on), F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(r_types[c]).alias(f"_r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        *by, F.col(on), F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(l_types[c]).alias(c) for c in left_payload],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    # right rows sort BEFORE a left row at the same ts (_is_left asc) so
    # same-timestamp right observations are visible to that left row
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_tag.unionByName(r_tag).select(
        *by, F.col(on), "_is_left", *left_payload,
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}")
            for c in right_cols
        ],
        F.max(F.when(F.col("_is_left") == 0, F.col(on))).over(w).alias("_r_ts"),
    )
    out = carried.filter(F.col("_is_left") == 1)
    fresh = (
        F.col("_r_ts") >= F.col(on) - F.expr(f"INTERVAL {tolerance}")
        if tolerance is not None
        else F.lit(True)
    )
    renames = {
        f"_r_{c}": (c if c not in left.columns else f"{c}{suffix}") for c in right_cols
    }
    return out.select(
        *by, F.col(on), *left_payload,
        *[F.when(fresh, F.col(old)).alias(new) for old, new in renames.items()],
        F.when(fresh, F.col("_r_ts")).alias(f"{on}{suffix}"),
    )
