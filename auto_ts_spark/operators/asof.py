"""As-of join — the canonical time-series join Spark has no native
operator for (reference has only index equi-joins, SURVEY.md §2.5; this
is a scale-extension operator every market-data / feature-store
pipeline needs).

Semantics (pandas ``merge_asof`` is the de-facto reference):

- ``direction='backward'`` (default): for each left row (key, ts),
  attach the latest right row with ``right.ts <= left.ts``.
- ``direction='forward'``: the earliest right row with
  ``right.ts >= left.ts``.
- ``direction='nearest'``: whichever of the two is closer in absolute
  time; exact ties go backward (pandas' tie rule).

Plan shape — the union trick, NOT a range join: tag both sides, union
(left payload rides along, right columns are NULL on left rows and
vice versa), one window sorted by (key, ts) with ``last(right_val,
ignorenulls=True)`` carries the most recent right observation forward
onto left rows. Cost is one shuffle on the key + one ordered window per
key — linear, no candidate-pair explosion, no inequality-join fallback
to nested loops, no re-join of the payload. This is how you as-of join
100 TB of ticks: the window state is one row per right column.
``forward`` is the same window ordered descending; ``nearest`` computes
both carries over the SAME key partitioning — one exchange, two sorts,
still linear and still zero candidate-pair blowup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from auto_ts_spark.operators.lags import cols_list

_DIRECTIONS = ("backward", "forward", "nearest")


def _carry_cols(
    by: Sequence[str],
    on: str,
    right_cols: Sequence[str],
    *,
    backward: bool,
    exact: bool,
) -> list[Column]:
    """Window-carried right columns for one direction. Backward scans
    ascending and carries the last right row seen; forward is the same
    carry over the descending order. Exact-match inclusion is purely a
    tie order: with ``exact`` right rows sort BEFORE a left row at the
    same ts (_is_left asc) so same-timestamp right observations are
    visible to it (inclusive <= / >=, merge_asof's default); without,
    they sort AFTER it and the carry at the left row excludes them
    (strict < / >, ``allow_exact_matches=False``)."""
    p = "_b_" if backward else "_f_"
    order = F.col(on).asc() if backward else F.col(on).desc()
    tie = F.col("_is_left").asc() if exact else F.col("_is_left").desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(order, tie)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    edge = F.max if backward else F.min
    return [
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{p}{c}")
            for c in right_cols
        ],
        edge(F.when(F.col("_is_left") == 0, F.col(on))).over(w).alias(f"{p}ts"),
    ]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: Sequence[str] = ("series_id",),
    right_cols: Sequence[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """As-of join of ``right`` onto ``left``.

    ``tolerance``: optional max time distance as an INTERVAL string
    (e.g. ``'2 hours'``) — matches farther than that become NULL, like
    pandas ``merge_asof(tolerance=...)``. ``direction``: ``backward``
    (default) / ``forward`` / ``nearest`` (ties go backward).
    ``allow_exact_matches=False`` makes the match strict (< / >),
    e.g. "the last trade strictly before the quote".
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}: {direction!r}")
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
    need_b = direction in ("backward", "nearest")
    need_f = direction in ("forward", "nearest")
    carried = l_tag.unionByName(r_tag).select(
        *by, F.col(on), "_is_left", *left_payload,
        *(
            _carry_cols(by, on, right_cols, backward=True, exact=allow_exact_matches)
            if need_b
            else []
        ),
        *(
            _carry_cols(by, on, right_cols, backward=False, exact=allow_exact_matches)
            if need_f
            else []
        ),
    )
    out = carried.filter(F.col("_is_left") == 1)

    tol = F.expr(f"INTERVAL {tolerance}") if tolerance is not None else None
    # per-side validity: a side contributes only if it matched at all
    # and (with tolerance) is within the staleness bound
    ok_b = F.col("_b_ts").isNotNull() if need_b else F.lit(False)
    ok_f = F.col("_f_ts").isNotNull() if need_f else F.lit(False)
    if tol is not None and need_b:
        ok_b = ok_b & (F.col("_b_ts") >= F.col(on) - tol)
    if tol is not None and need_f:
        ok_f = ok_f & (F.col("_f_ts") <= F.col(on) + tol)
    if direction == "nearest":
        # closer side wins; exact tie -> backward (pandas' rule); a
        # side that is invalid (no match / out of tolerance) loses.
        # NTZ inputs can't cast straight to double — go through
        # timestamp (no-op for regular timestamps; session TZ is
        # pinned UTC, and the constant offset cancels in a difference)
        def _secs(c: Column) -> Column:
            return c.cast("timestamp").cast("double")

        dist_b = _secs(F.col(on)) - _secs(F.col("_b_ts"))
        dist_f = _secs(F.col("_f_ts")) - _secs(F.col(on))
        use_b = ok_b & (~ok_f | (dist_b <= dist_f))
        use_f = ok_f & ~use_b

        def pick(c: str) -> Column:
            return F.when(use_b, F.col(f"_b_{c}")).when(use_f, F.col(f"_f_{c}"))

    else:
        p, ok = ("_b_", ok_b) if direction == "backward" else ("_f_", ok_f)

        def pick(c: str) -> Column:
            return F.when(ok, F.col(f"{p}{c}"))

    renames = {c: (c if c not in left.columns else f"{c}{suffix}") for c in right_cols}
    return out.select(
        *by, F.col(on), *left_payload,
        *[pick(c).alias(new) for c, new in renames.items()],
        pick("ts").alias(f"{on}{suffix}"),
    )
