"""Time individual headline queries in isolation (noop sink, median of
N runs) — the per-query A/B harness for the optimization rounds.

Usage: python tools/time_query.py q1 [q2 ...] [--runs N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B
import __spark_entry__ as E
from pyspark.sql import functions as F
from auto_ts_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time_query")
    qs = dict(
        E.queries(), curate_chain=B.q_curate_chain, curate_full=B.q_curate_full
    )
    # the same warmup bench.py runs (JVM codegen + worker pool + model
    # imports) so a single-query timing is comparable to the bench's
    spark.range(100_000).selectExpr("sum(id) s").write.format("noop").mode(
        "overwrite"
    ).save()
    E.load_table(spark, sf_dir, "region").write.format("noop").mode(
        "overwrite"
    ).save()

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
    from auto_ts_spark.operators import dedup as _DD

    _tiny = spark.createDataFrame(
        [(i, f"warm up text row {i} alpha beta gamma delta") for i in range(64)],
        "doc_id long, text string",
    )
    _DD.minhash_lsh_pairs(_tiny, text_col="text", id_col="doc_id").write.format(
        "noop"
    ).mode("overwrite").save()
    for name in args:
        fn = qs[name]
        vals = []
        for _ in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            vals.append(time.perf_counter() - t0)
        med = statistics.median(vals)
        print(
            f"TIMING {name}: median={med:.3f}s runs={[round(v, 3) for v in vals]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
