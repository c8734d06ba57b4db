"""Scale probe for the r6 quality operators: CCNet LM-perplexity
scoring and the in-engine fastText-style classifier, measured on the
documents table at growing scale factors.

For each sf dir it times
  - lm: train_ngram_lm on the en slice + perplexity_score over the
    whole corpus + tercile summary (one action)
  - clf: train_quality_classifier (3 iterations, the default entry
    shape) + classify + a count action

and prints one JSON line per (sf, op) with docs/sec so super-linear
growth is visible at a glance.

Usage: python tools/probe_quality_ops_scale.py [sf_dir ...]
  default: /root/testdata/sf0.1 .localdata/sf1 .localdata/sf10
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(dirs: list[str]) -> None:
    from pyspark.sql import functions as F

    from auto_ts_spark import get_spark
    from auto_ts_spark.io.sources import load_table
    from auto_ts_spark.operators import lm_quality as LQ
    from auto_ts_spark.operators import quality_classifier as QC

    spark = get_spark("probe-quality-ops")
    for sf_dir in dirs:
        docs = load_table(spark, sf_dir, "documents")
        n = docs.count()

        t0 = time.perf_counter()
        lm = LQ.train_ngram_lm(docs.filter(F.col("lang") == "en"))
        buckets = LQ.perplexity_terciles(LQ.perplexity_score(docs, lm))
        n_b = buckets.count()
        lm_wall = time.perf_counter() - t0
        print(json.dumps({
            "probe": "lm_perplexity", "sf_dir": sf_dir, "docs": n,
            "wall_sec": round(lm_wall, 2),
            "docs_per_sec": round(n / lm_wall),
            "tercile_rows": n_b,
        }), flush=True)
        lm.uni.unpersist()
        lm.bi.unpersist()

        t0 = time.perf_counter()
        w = QC.train_quality_classifier(
            docs, F.col("lang") == "en", n_buckets=128, iters=3, lr=1.0
        )
        kept = QC.classify(docs, w, n_buckets=128).count()
        clf_wall = time.perf_counter() - t0
        print(json.dumps({
            "probe": "quality_classifier", "sf_dir": sf_dir, "docs": n,
            "wall_sec": round(clf_wall, 2),
            "docs_per_sec": round(n / clf_wall),
            "scored": kept,
        }), flush=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:] or [
        "/root/testdata/sf0.1",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata/sf1"),
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata/sf10"),
    ])
