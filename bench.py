"""BENCH: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <scale factor>}

Each query is forced through the noop sink (full materialization —
``count()`` would let Catalyst prune unreferenced projections and
under-report).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E
from pyspark.sql import functions as F
from auto_ts_spark.session import get_spark

HEADLINE = [
    "tpch_pricing_summary",
    "lag_matrix",
    "rolling_stats",
    "naive_forecast_metrics",
    "expanding_folds",
    "hourly_rollup",
    "sessionize",
    "topk_suppliers",
    "token_explode",
    "text_profile",
    "minhash_lsh_pairs",
    "embedding_topk",
    "automl_leaderboard",
    "asof_join",
    "seasonal_decompose",
    "revenue_rollup",
    "resample_ffill",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    spark = get_spark("bench")
    qs = E.queries()
    # JVM/codegen warmup outside the timed loop: a tiny codegen'd agg +
    # a scan of the smallest table to class-load the parquet reader
    spark.range(100_000).selectExpr("sum(id) s").write.format("noop").mode(
        "overwrite"
    ).save()
    E.load_table(spark, sf_dir, "region").write.format("noop").mode(
        "overwrite"
    ).save()
    # spawn the Python/Arrow UDF worker pool outside the timed loop
    spark.range(64).withColumn("g", F.col("id") % 8).groupBy("g").applyInPandas(
        lambda p: p, "id long, g long"
    ).write.format("noop").mode("overwrite").save()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
