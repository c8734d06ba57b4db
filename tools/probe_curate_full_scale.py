"""curate_full decade probe: the COMPLETE 10-stage raw→manifest recipe
(cross-doc span scrub → Gopher quality gate → PII scrub → exact dedup →
bounded SEMANTIC near-dedup over planted embeddings → CCNet perplexity
gate → in-engine classifier gate → decontamination → source mixture →
per-source token budget) at 50k and 500k documents, in ONE job graph on
one 8g JVM.

Purpose (BASELINE.md r9 row, r7 verdict task #3 / r8 task #4): every
stage is probed linear-or-better in isolation (see the r6/r7 rows), but
the full recipe had only run to 50k docs — stage INTERACTION (bounded
semantic-dedup persists + classifier feature persist + LM shuffle-join
sharing one executor heap) was unmeasured past that. This measures
per-stage wall at 50k vs 500k so any super-linear interaction shows as
a stage ratio > 10.

Data: the gen_testdata document recipe (2% near-dup, 0.2% exact copies,
vocab grown with the corpus) plus a 64-dim embedding per document —
10 unit-norm centers + noise, with the documents' exact-copy tail
mirrored as exact embedding copies, so the semantic stage has real
collapse + pair work. The LM/classifier reference is a deterministic
1-in-7 slice of the corpus (the bench's self-referential but
measurement-stable recipe, classifier threshold at the class prior).

Usage: python tools/probe_curate_full_scale.py [n_docs ...]
  default: 50000 500000
Prints one JSON line per scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from gen_testdata import make_documents  # noqa: E402


def _make_embeddings(path: str, n: int) -> None:
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(777)
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n)
    vecs = centers[labels] + rng.normal(0, 0.35, (n, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    n_dup = max(1, n // 500)  # mirror the documents' exact-copy tail
    vecs[n - n_dup :] = vecs[:n_dup]
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(vecs.astype(np.float32).ravel(), pa.float32()), 64
    )
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(n), pa.int64()), "embedding": arr}),
        f"{path}/part0.parquet",
    )


def probe(spark, n_doc: int, workdir: str) -> dict:
    from pyspark.sql import functions as F

    from auto_ts_spark.corpus import curate

    dpath = os.path.join(workdir, f"docs_{n_doc}")
    if not os.path.exists(dpath):
        os.makedirs(dpath, exist_ok=True)
        rng = np.random.default_rng(1234)
        pq.write_table(
            make_documents(rng, n_doc, vocab_mult=max(1, n_doc // 10_000)),
            f"{dpath}/part0.parquet",
        )
    epath = os.path.join(workdir, f"emb_{n_doc}")
    if not os.path.exists(epath):
        _make_embeddings(epath, n_doc)
    docs = spark.read.parquet(dpath)
    emb = spark.read.parquet(epath)
    ref = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    mixture = {"src0": 1.0, "src1": 1.5}

    secs: dict[str, float] = {}
    t0 = time.perf_counter()
    out, counts = curate(
        docs,
        scrub_spans=True,
        near_dedup_method="semantic",
        embeddings=emb,
        semantic_threshold=0.95,
        perplexity_ref=ref,
        classifier_ref=ref,
        classifier_threshold=0.125,  # the class prior (ref = 1-in-7)
        benchmark=bench,
        mixture=mixture,
        token_budget=2_000_000,
        budget_by="source",
        stage_counts=True,
        stage_seconds=secs,
    )
    n_out = out.count()
    wall = time.perf_counter() - t0
    return {
        "n_docs": n_doc,
        "wall_total_s": round(wall, 2),
        "stage_seconds": {k: round(v, 2) for k, v in secs.items()},
        "stage_counts": counts,
        "n_out": n_out,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 500_000]
    from auto_ts_spark import get_spark

    spark = get_spark("probe_curate_full_scale")
    workdir = "/root/repo/.localdata/probe_docs"
    probe(spark, 2_000, workdir)  # warmup: codegen + worker pool
    for n in sizes:
        print(json.dumps(probe(spark, n, workdir)), flush=True)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    spark.stop()
