"""Bucketed co-located join: results identical to a plain join, and the
physical plan has NO Exchange on either join input — the shuffle was
paid once at write time."""

import pytest
from pyspark.sql import functions as F

from auto_ts_spark.io.bucketing import bucketed_join, write_bucketed
from auto_ts_spark.io.sources import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_extendedprice")
    ot = write_bucketed(o, "tb_orders", bucket_by="o_orderkey", num_buckets=4)
    lt = write_bucketed(li, "tb_lineitem", bucket_by="l_orderkey", num_buckets=4)
    yield lt, ot
    for t in (lt, ot):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, ot = bucketed_tables
    cond = F.col("l_orderkey") == F.col("o_orderkey")
    got = (
        bucketed_join(spark, lt, ot, on=cond)
        .groupBy("o_orderpriority")
        .count()
        .orderBy("o_orderpriority")
        .collect()
    )
    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    want = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .count()
        .orderBy("o_orderpriority")
        .collect()
    )
    assert got == want


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, ot = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(
            spark, lt, ot, on=F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"


def test_bucket_files_one_per_bucket(spark, bucketed_tables):
    """write_bucketed repartitions on the bucket key first, so each
    bucket is one file — bounding small-file count at scale and keeping
    the within-bucket sort usable."""
    lt, _ = bucketed_tables
    files = (
        spark.sql(f"DESCRIBE EXTENDED {lt}")
        .filter(F.col("col_name") == "Location")
        .collect()
    )
    loc = files[0]["data_type"].replace("file:", "")
    import os

    data_files = [f for f in os.listdir(loc) if f.endswith(".parquet")]
    assert len(data_files) == 4, data_files
