"""As-of join vs pandas merge_asof (the de-facto semantics reference),
including tolerance and same-timestamp inclusion."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from auto_ts_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.RandomState(3)
    left = pd.DataFrame(
        {
            "series_id": np.repeat(["a", "b"], 50),
            "ts": list(pd.date_range("2024-01-01", periods=50, freq="37min")) * 2,
            "order_id": range(100),
        }
    )
    right = pd.DataFrame(
        {
            "series_id": np.repeat(["a", "b"], 30),
            "ts": list(pd.date_range("2024-01-01 00:05", periods=30, freq="61min")) * 2,
            "px": rng.rand(60).round(6),
        }
    )
    return left, right


def _expected(left, right, tolerance=None, direction="backward"):
    kw = {"tolerance": pd.Timedelta(tolerance)} if tolerance else {}
    return (
        pd.merge_asof(
            left.sort_values("ts"),
            right.sort_values("ts").rename(columns={"ts": "ts_right"}),
            left_on="ts",
            right_on="ts_right",
            by="series_id",
            direction=direction,
            **kw,
        )
        .sort_values(["series_id", "ts"])
        .reset_index(drop=True)
    )


def test_asof_matches_pandas_merge_asof(spark, frames):
    left, right = frames
    got = (
        asof_join(spark.createDataFrame(left), spark.createDataFrame(right))
        .toPandas()
        .sort_values(["series_id", "ts"])
        .reset_index(drop=True)
    )
    want = _expected(left, right)
    pd.testing.assert_frame_equal(
        got[["series_id", "ts", "order_id", "px", "ts_right"]],
        want[["series_id", "ts", "order_id", "px", "ts_right"]],
        check_dtype=False,
    )


def test_asof_tolerance(spark, frames):
    left, right = frames
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            tolerance="30 minutes",
        )
        .toPandas()
        .sort_values(["series_id", "ts"])
        .reset_index(drop=True)
    )
    want = _expected(left, right, tolerance="30min")
    pd.testing.assert_frame_equal(
        got[["series_id", "ts", "order_id", "px", "ts_right"]],
        want[["series_id", "ts", "order_id", "px", "ts_right"]],
        check_dtype=False,
    )
    assert got["px"].isna().sum() > 0  # tolerance actually nulled stale matches


@pytest.mark.parametrize("direction", ["forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, "30 minutes"])
def test_asof_directions_match_pandas(spark, frames, direction, tolerance):
    """forward / nearest (x with/without tolerance) against pandas
    merge_asof — including pandas' nearest tie rule (ties go
    backward), which the 37min-left x 61min-right grid does hit."""
    left, right = frames
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            direction=direction,
            tolerance=tolerance,
        )
        .toPandas()
        .sort_values(["series_id", "ts"])
        .reset_index(drop=True)
    )
    want = _expected(
        left, right, tolerance=tolerance and "30min", direction=direction
    )
    pd.testing.assert_frame_equal(
        got[["series_id", "ts", "order_id", "px", "ts_right"]],
        want[["series_id", "ts", "order_id", "px", "ts_right"]],
        check_dtype=False,
    )


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_strict_matches_pandas(spark, frames, direction):
    """allow_exact_matches=False (strict < / >) against pandas, for
    all three directions — the right grid's 00:05 offsets plus the
    equal-timestamp fixtures give exact-ts collisions to exclude."""
    left, right = frames
    # plant exact-ts collisions so strictness is actually exercised
    collide = right.copy()
    collide.loc[collide.index[:10], "ts"] = left["ts"].iloc[:10].values
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(collide),
            direction=direction,
            allow_exact_matches=False,
        )
        .toPandas()
        .sort_values(["series_id", "ts"])
        .reset_index(drop=True)
    )
    want = (
        pd.merge_asof(
            left.sort_values("ts"),
            collide.sort_values("ts").rename(columns={"ts": "ts_right"}),
            left_on="ts",
            right_on="ts_right",
            by="series_id",
            direction=direction,
            allow_exact_matches=False,
        )
        .sort_values(["series_id", "ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["series_id", "ts", "order_id", "px", "ts_right"]],
        want[["series_id", "ts", "order_id", "px", "ts_right"]],
        check_dtype=False,
    )


def test_asof_nearest_exact_tie_goes_backward(spark):
    left = pd.DataFrame(
        {"series_id": ["a"], "ts": [pd.Timestamp("2024-01-01 00:10")], "order_id": [1]}
    )
    right = pd.DataFrame(
        {
            "series_id": ["a", "a"],
            "ts": [pd.Timestamp("2024-01-01 00:05"), pd.Timestamp("2024-01-01 00:15")],
            "px": [1.0, 2.0],
        }
    )
    got = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right), direction="nearest"
    ).toPandas()
    assert got["px"].iloc[0] == 1.0  # equidistant -> earlier (pandas rule)


def test_asof_nearest_accepts_ntz_timestamps(spark):
    """Driver testdata loads as TIMESTAMP_NTZ, which cannot cast
    straight to double — the nearest-distance computation must go
    through a timestamp cast (regression: r9 verify run)."""
    left = spark.sql(
        "SELECT 'a' AS series_id, CAST('2024-01-01 00:10:00' AS TIMESTAMP_NTZ) AS ts,"
        " 1 AS order_id"
    )
    right = spark.sql(
        "SELECT 'a' AS series_id, CAST('2024-01-01 00:05:00' AS TIMESTAMP_NTZ) AS ts,"
        " 1.0 AS px"
        " UNION ALL SELECT 'a', CAST('2024-01-01 00:12:00' AS TIMESTAMP_NTZ), 2.0"
    )
    got = asof_join(left, right, direction="nearest").toPandas()
    assert got["px"].iloc[0] == 2.0  # 2min forward beats 5min backward


def test_asof_null_payload_not_backfilled(spark):
    """A right row whose payload column is genuinely NULL must carry
    that NULL (merge_asof semantics) — not backfill it from an older
    right row. Guards the struct-carry design: the matched row travels
    as a unit (regression: r9 ADVICE, per-column last(ignorenulls))."""
    left = pd.DataFrame(
        {
            "series_id": ["a"],
            "ts": [pd.Timestamp("2024-01-01 00:20")],
            "order_id": [1],
        }
    )
    right = pd.DataFrame(
        {
            "series_id": ["a", "a"],
            "ts": [pd.Timestamp("2024-01-01 00:05"), pd.Timestamp("2024-01-01 00:10")],
            "px": [1.0, None],
            "qty": [10.0, 20.0],
        }
    )
    for direction in ("backward", "nearest"):
        got = asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            direction=direction,
        ).toPandas()
        # the 00:10 row is the match; its px is NULL and must stay NULL
        assert pd.isna(got["px"].iloc[0]), direction
        assert got["qty"].iloc[0] == 20.0, direction
        assert got["ts_right"].iloc[0] == pd.Timestamp("2024-01-01 00:10"), direction
    # no right row at/after 00:20 -> forward matches nothing at all
    fwd = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        direction="forward",
    ).toPandas()
    assert pd.isna(fwd["qty"].iloc[0]) and pd.isna(fwd["ts_right"].iloc[0])


def test_asof_right_column_named_ts_with_other_on(spark):
    """A right payload column literally named 'ts' (while joining on a
    different column) must come through intact — no collision with the
    internal match-timestamp alias (regression: r9 ADVICE)."""
    left = spark.sql(
        "SELECT 'a' AS series_id, CAST('2024-01-01 00:10:00' AS TIMESTAMP) AS t,"
        " 1 AS order_id"
    )
    right = spark.sql(
        "SELECT 'a' AS series_id, CAST('2024-01-01 00:05:00' AS TIMESTAMP) AS t,"
        " CAST('2030-06-06 06:06:06' AS TIMESTAMP) AS ts, 1.5 AS px"
    )
    got = asof_join(left, right, on="t", by=["series_id"]).toPandas()
    assert got["px"].iloc[0] == 1.5
    assert got["ts"].iloc[0] == pd.Timestamp("2030-06-06 06:06:06")
    assert got["t_right"].iloc[0] == pd.Timestamp("2024-01-01 00:05")


def test_asof_bad_direction_rejected(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            direction="sideways",
        )


def test_asof_equal_timestamp_included(spark):
    left = pd.DataFrame(
        {"series_id": ["a"], "ts": [pd.Timestamp("2024-01-01 12:00")], "order_id": [1]}
    )
    right = pd.DataFrame(
        {"series_id": ["a"], "ts": [pd.Timestamp("2024-01-01 12:00")], "px": [9.5]}
    )
    got = asof_join(spark.createDataFrame(left), spark.createDataFrame(right)).toPandas()
    assert got["px"].iloc[0] == 9.5  # ts == ts matches (backward inclusive)


def test_asof_string_by_and_empty_right(spark):
    """A bare-string ``by`` must behave like a one-element list (not
    explode into per-character columns), and an empty right side must
    yield all-NULL carried columns, one row per left row."""
    import pandas as pd

    from auto_ts_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "series_id": ["a"] * 3,
                "ts": pd.date_range("2024-01-01", periods=3, freq="h"),
                "v": [1.0, 2.0, 3.0],
            }
        )
    )
    right = spark.createDataFrame([], schema="series_id string, ts timestamp, q double")
    out = asof_join(left, right, on="ts", by="series_id").toPandas()
    assert len(out) == 3
    assert out["q"].isna().all()


def test_asof_nearest_plan_one_exchange_two_sorts(spark, frames):
    """The nearest direction must stay ONE hash exchange + two ordered
    window passes (the struct-carry rewrite must not re-shuffle per
    direction or fall back to a range/nested-loop join)."""
    import re

    left, right = frames
    plan = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            direction="nearest",
            tolerance="2 hours",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert len(re.findall(r"Window ", plan)) == 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
