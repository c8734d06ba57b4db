"""Curate-chain scale probe: wall-clock per stage at 50k / 150k / 500k
documents with the generator's realistic duplicate density (2%
near-dup, 0.2% exact), plus connected-components round counts.

Purpose (BASELINE.md r6 row): the chain is the flagship deliverable but
its earlier probes stopped at 5k docs — this measures which stages stay
linear as the corpus grows 10x and confirms near-dup is the only
super-linear-ish stage and CC convergence stays flat.

Usage: python tools/probe_curate_scale.py [n_docs ...]
  default: 50000 150000 500000
Prints one JSON line per scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from gen_testdata import make_documents  # noqa: E402


def probe(spark, n_doc: int, workdir: str) -> dict:
    from pyspark.sql import functions as F

    from auto_ts_spark.corpus import curate
    from auto_ts_spark.operators import dedup as DD

    path = os.path.join(workdir, f"docs_{n_doc}")
    if not os.path.exists(path):
        os.makedirs(path, exist_ok=True)
        rng = np.random.default_rng(1234)
        pq.write_table(make_documents(rng, n_doc), f"{path}/part0.parquet")
    docs = spark.read.parquet(path)
    bench = spark.createDataFrame(
        [(900001, "spark batch part line column order small"),
         (900002, "vector query agg table hash slow filter")],
        "doc_id long, text string",
    )

    t0 = time.perf_counter()
    secs: dict[str, float] = {}
    out, counts = curate(
        docs,
        benchmark=bench,
        mixture={"src0": 1.0, "src1": 1.5},
        token_budget=2_000_000,
        budget_by="source",
        stage_counts=True,
        stage_seconds=secs,
    )
    n_out = out.count()
    wall = time.perf_counter() - t0

    # CC rounds on the same corpus (post quality+redact+exact-dedup
    # approximated by the raw corpus — rounds depend on component
    # shape, not the head filters)
    cc_stats: dict = {}
    t1 = time.perf_counter()
    DD.dedup_clusters(docs, cc_stats=cc_stats).filter(
        ~F.col("is_keep")
    ).count()
    cc_wall = time.perf_counter() - t1

    return {
        "n_docs": n_doc,
        "wall_total_s": round(wall, 2),
        "stage_seconds": {k: round(v, 2) for k, v in secs.items()},
        "stage_counts": counts,
        "n_out": n_out,
        "cc_rounds": cc_stats.get("rounds"),
        "dedup_clusters_wall_s": round(cc_wall, 2),
    }


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 150_000, 500_000]
    from auto_ts_spark import get_spark

    spark = get_spark("probe_curate_scale")
    workdir = "/root/repo/.localdata/probe_docs"
    # warmup: compile the minhash codegen tree + import worker modules
    probe(spark, 2_000, workdir)
    for n in sizes:
        print(json.dumps(probe(spark, n, workdir)), flush=True)
    spark.stop()
