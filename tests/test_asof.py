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


def _expected(left, right, tolerance=None):
    kw = {"tolerance": pd.Timedelta(tolerance)} if tolerance else {}
    return (
        pd.merge_asof(
            left.sort_values("ts"),
            right.sort_values("ts").rename(columns={"ts": "ts_right"}),
            left_on="ts",
            right_on="ts_right",
            by="series_id",
            direction="backward",
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
