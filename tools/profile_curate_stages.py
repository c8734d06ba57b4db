"""Per-stage wall-clock profile of the two bench curate pipelines
(curate_chain / curate_full) via curate()'s stage_counts +
stage_seconds hook. Diagnostic only — the checkpoint-per-stage
execution differs from the lazy bench plan, but the per-stage split
shows where the seconds go.

Usage: python tools/profile_curate_stages.py [chain|full]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B
import __spark_entry__ as E
from pyspark.sql import functions as F
from auto_ts_spark.corpus import curate
from auto_ts_spark.session import get_spark


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "full"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_curate")
    docs = E.load_table(spark, sf_dir, "documents")
    bench_docs = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    mixture = {f"src{i}": (2.0 if i < 3 else 1.0) for i in range(20)}
    secs: dict[str, float] = {}
    kwargs = dict(
        benchmark=bench_docs,
        mixture=mixture,
        token_budget=200_000,
        budget_by="source",
        stage_counts=True,
        stage_seconds=secs,
    )
    if which == "full":
        emb = E.load_table(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("doc_id"), "embedding"
        )
        ref = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text")
        kwargs.update(
            scrub_spans=True,
            near_dedup_method="semantic",
            embeddings=emb,
            semantic_threshold=0.95,
            perplexity_ref=ref,
            classifier_ref=ref,
            classifier_threshold=0.125,
        )
    t0 = time.perf_counter()
    out, counts = curate(docs, **kwargs)
    out.write.format("noop").mode("overwrite").save()
    total = time.perf_counter() - t0
    print(f"\n=== curate_{which} stage profile (sf_dir={sf_dir}) ===")
    for name, c in counts.items():
        print(f"{name:>16}: {secs.get(name, float('nan')):7.2f} s   rows={c}")
    print(f"{'TOTAL':>16}: {total:7.2f} s (incl. final write)")
    spark.stop()


if __name__ == "__main__":
    main()
