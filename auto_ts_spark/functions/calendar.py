"""Calendar feature extraction with pandas-parity semantics.

Reference parity: W8 ``create_time_series_features``
(auto_ts/models/build_ml.py:688-860) derives hour, minute, dayofweek,
quarter, month, year, dayofyear, dayofmonth, weekofyear, weekend from
the time index.

Parity gotchas handled here (SURVEY.md §4.5):
- pandas ``dayofweek`` is Monday=0; Spark ``dayofweek`` is Sunday=1 →
  we emit ``(dayofweek(ts) + 5) % 7`` so Monday=0 everywhere.
- ``weekofyear`` is ISO-8601 in both pandas and Spark (verified in tests).
- weekend = dayofweek ∈ {5, 6} (Sat/Sun in Monday=0 numbering).

All features are plain Catalyst expressions — whole-stage-codegen'd,
no shuffle, no Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FEATURES: tuple[str, ...] = (
    "hour",
    "minute",
    "dayofweek",
    "quarter",
    "month",
    "year",
    "dayofyear",
    "dayofmonth",
    "weekofyear",
    "weekend",
)


def calendar_expr(ts: Column, feature: str) -> Column:
    dow_mon0 = (F.dayofweek(ts) + F.lit(5)) % F.lit(7)
    exprs = {
        "hour": F.hour(ts),
        "minute": F.minute(ts),
        "dayofweek": dow_mon0,
        "quarter": F.quarter(ts),
        "month": F.month(ts),
        "year": F.year(ts),
        "dayofyear": F.dayofyear(ts),
        "dayofmonth": F.dayofmonth(ts),
        "weekofyear": F.weekofyear(ts),
        "weekend": dow_mon0.isin(5, 6).cast("int"),
    }
    return exprs[feature]


def add_calendar_features(
    df: DataFrame,
    ts_col: str = "ts",
    features: Sequence[str] = FEATURES,
    prefix: str = "ts_",
) -> DataFrame:
    """Append calendar feature columns ``{prefix}{feature}``."""
    ts = F.col(ts_col)
    return df.select(
        "*", *[calendar_expr(ts, f).cast("int").alias(f"{prefix}{f}") for f in features]
    )
