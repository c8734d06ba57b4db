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
vice versa), one window sorted by (key, ts) carries the most recent
right observation forward onto left rows. Cost is one shuffle on the
key + one ordered window per key — linear, no candidate-pair
explosion, no inequality-join fallback to nested loops, no re-join of
the payload. This is how you as-of join 100 TB of ticks: the window
state is one row per right column. ``forward`` is the same window
ordered descending; ``nearest`` computes both carries over the SAME
key partitioning — one exchange, two sorts, still linear and still
zero candidate-pair blowup.

The carry is ONE struct of (match ts, all right payload columns) per
direction, not per-column ``last(...)`` calls: the matched right row
travels as a unit, so a right row whose payload column is genuinely
NULL stays NULL (it is never backfilled from an older right row), the
emitted row can never mix columns from different right rows, and in
``nearest`` the payload always corresponds to the timestamp the
distance pick used. Struct fields are namespaced, so a right column
literally named ``ts`` cannot collide with the internal match-ts
field. Nearest distances compare the raw timestamp difference (a
day-time interval) — no cast through the session timezone, so
TIMESTAMP_NTZ inputs are safe even in a DST-observing session TZ.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from auto_ts_spark.operators.lags import cols_list

_DIRECTIONS = ("backward", "forward", "nearest")

# struct field holding the matched right row's timestamp; reserved
_MATCH_TS = "__match_ts"


def _carry_struct(
    by: Sequence[str],
    on: str,
    right_cols: Sequence[str],
    *,
    backward: bool,
    exact: bool,
) -> Column:
    """Window-carried matched right row (one struct: match ts + every
    right payload column) for one direction. Backward scans ascending
    and carries the last right row seen; forward is the same carry over
    the descending order. Exact-match inclusion is purely a tie order:
    with ``exact`` right rows sort BEFORE a left row at the same ts
    (_is_left asc) so same-timestamp right observations are visible to
    it (inclusive <= / >=, merge_asof's default); without, they sort
    AFTER it and the carry at the left row excludes them (strict < / >,
    ``allow_exact_matches=False``)."""
    p = "_b" if backward else "_f"
    order = F.col(on).asc() if backward else F.col(on).desc()
    tie = F.col("_is_left").asc() if exact else F.col("_is_left").desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(order, tie)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    row = F.when(
        F.col("_is_left") == 0,
        F.struct(
            F.col(on).alias(_MATCH_TS),
            *[F.col(f"_r_{c}").alias(c) for c in right_cols],
        ),
    )
    return F.last(row, ignorenulls=True).over(w).alias(p)


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
    if _MATCH_TS in right_cols:
        raise ValueError(f"right column name {_MATCH_TS!r} is reserved by asof_join")
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
            [_carry_struct(by, on, right_cols, backward=True, exact=allow_exact_matches)]
            if need_b
            else []
        ),
        *(
            [_carry_struct(by, on, right_cols, backward=False, exact=allow_exact_matches)]
            if need_f
            else []
        ),
    )
    out = carried.filter(F.col("_is_left") == 1)

    ts_b = F.col("_b").getField(_MATCH_TS)
    ts_f = F.col("_f").getField(_MATCH_TS)
    tol = F.expr(f"INTERVAL {tolerance}") if tolerance is not None else None
    # per-side validity: a side contributes only if it matched at all
    # and (with tolerance) is within the staleness bound
    ok_b = ts_b.isNotNull() if need_b else F.lit(False)
    ok_f = ts_f.isNotNull() if need_f else F.lit(False)
    if tol is not None and need_b:
        ok_b = ok_b & (ts_b >= F.col(on) - tol)
    if tol is not None and need_f:
        ok_f = ok_f & (ts_f <= F.col(on) + tol)
    if direction == "nearest":
        # closer side wins; exact tie -> backward (pandas' rule); a
        # side that is invalid (no match / out of tolerance) loses.
        # Distances are raw timestamp differences (day-time intervals,
        # directly comparable) — no session-TZ cast, so TIMESTAMP_NTZ
        # is safe even when the session TZ observes DST.
        dist_b = F.col(on) - ts_b
        dist_f = ts_f - F.col(on)
        use_b = ok_b & (~ok_f | (dist_b <= dist_f))
        use_f = ok_f & ~use_b

        def pick(field: str) -> Column:
            return F.when(use_b, F.col("_b").getField(field)).when(
                use_f, F.col("_f").getField(field)
            )

    else:
        side, ok = ("_b", ok_b) if direction == "backward" else ("_f", ok_f)

        def pick(field: str) -> Column:
            return F.when(ok, F.col(side).getField(field))

    renames = {c: (c if c not in left.columns else f"{c}{suffix}") for c in right_cols}
    return out.select(
        *by, F.col(on), *left_payload,
        *[pick(c).alias(new) for c, new in renames.items()],
        pick(_MATCH_TS).alias(f"{on}{suffix}"),
    )
