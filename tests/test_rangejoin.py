"""Range join: bin-bucketed result ≡ naive non-equi join, invariant to
bin width, and never a cartesian plan."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from auto_ts_spark.operators.rangejoin import range_join


@pytest.fixture(scope="module")
def data(spark):
    t0 = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [(i, t0 + dt.timedelta(seconds=37 * i)) for i in range(400)],
        "pid long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (
                j,
                t0 + dt.timedelta(seconds=300 * j),
                t0 + dt.timedelta(seconds=300 * j + width),
            )
            for j, width in [(0, 600), (1, 45), (2, 0), (3, 4000), (4, 1)]
        ],
        "iid long, w_start timestamp, w_end timestamp",
    )
    return pts, ivs


def _naive(pts, ivs):
    return (
        pts.join(ivs, (pts.ts >= ivs.w_start) & (pts.ts < ivs.w_end))
        .select("pid", "iid")
        .collect()
    )


@pytest.mark.parametrize("bin_seconds", [1, 60, 600, 86400])
def test_matches_naive_join_any_bin_width(spark, data, bin_seconds):
    pts, ivs = data
    got = range_join(
        pts, ivs, point_ts="ts", start="w_start", end="w_end", bin_seconds=bin_seconds
    ).select("pid", "iid")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, _naive(pts, ivs)))


def test_end_exclusive_and_empty_interval(spark, data):
    pts, ivs = data
    got = range_join(
        pts, ivs, point_ts="ts", start="w_start", end="w_end", bin_seconds=600
    )
    # interval 2 has zero width, interval 4 is [t, t+1s) and no point
    # lands on an exact 300s boundary offset except pid 0 in interval 0
    iids = {r["iid"] for r in got.select("iid").distinct().collect()}
    assert 2 not in iids


def test_equi_key_restricts_matches(spark):
    t0 = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [(i, i % 2, t0 + dt.timedelta(seconds=10 * i)) for i in range(100)],
        "pid long, k long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [(0, 0, t0, t0 + dt.timedelta(seconds=1000))],
        "iid long, k long, w_start timestamp, w_end timestamp",
    )
    got = range_join(
        pts, ivs, point_ts="ts", start="w_start", end="w_end", bin_seconds=60, on=["k"]
    )
    rows = got.select("pid").collect()
    assert all(r["pid"] % 2 == 0 for r in rows) and len(rows) == 50


def test_plan_is_equi_join_not_cartesian(spark, data):
    pts, ivs = data
    j = range_join(
        pts, ivs, point_ts="ts", start="w_start", end="w_end", bin_seconds=600
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
