"""prepare_rag_corpus decade probe (r13): the full chunk → embed →
chunk-level SemDeDup → retention chain at 500k and 5M docs over the
curate-probe fixtures (chunk_tokens=64, stride=48 → ~1.4 chunks/doc,
so the 5M point dedups ~7M chunk vectors — one decade past nothing:
this facade landed in r13 and this is its first record; the pieces
it composes have their own records: doc_chunks 5M docs r12, SemDeDup
5M vectors r12).

Embeddings are a deterministic JVM-side bag-of-hashed-words: dim-32
vectors where component d = Σ_tokens (xxhash64(token, d) ‰ scaled to
[-0.5, 0.5]) / √n_tokens — one projection, no Python, and near-dup
chunk text (the fixtures plant 2% near + 0.2% exact doc dups) maps to
nearby vectors so the dedup stage does real work. Real pipelines swap
this for a model encoder via the same ``embed=`` hook.

Expected shape: chunking byte-linear (zero Exchange), embedding one
projection, dedup bounded by Σ|cell|² ≤ n·max_cell_size. Per the r12
quality-gate finding, read decade ratios in BYTES (these fixtures
grow chars ~10.65× per 10× docs).

Usage: python tools/probe_rag_corpus_scale.py [n_docs ...]
  default: 500000 5000000
Prints one JSON line per scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(__file__))

DIM = 32


def _embed(chunks):
    """chunks -> chunks + 'embedding' (dim-32 double array), pure JVM:
    per-component token-hash sum scaled by 1/sqrt(n_tokens)."""
    from pyspark.sql import functions as F

    toks = F.split(F.col("chunk_text"), r"\s+")

    def comp(d):
        return F.aggregate(
            toks,
            F.lit(0.0),
            lambda acc, t: acc
            + ((F.pmod(F.xxhash64(t, F.lit(d)), F.lit(1000)) / 1000.0) - 0.5),
        ) / F.sqrt(F.size(toks).cast("double"))

    return chunks.withColumn("embedding", F.array(*[comp(d) for d in range(DIM)]))


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [500_000, 5_000_000]
    import numpy as np
    import pyarrow.parquet as pq

    from probe_curate_full_scale import make_curate_documents  # noqa: E402

    from auto_ts_spark import get_spark
    from auto_ts_spark.corpus import prepare_rag_corpus

    spark = get_spark("probe_rag_corpus_scale")
    workdir = "/root/repo/.localdata/probe_docs"
    for warm in (True, False):
        for n in [2_000] if warm else sizes:
            dpath = os.path.join(workdir, f"docs_curate_{n}")
            if not os.path.exists(os.path.join(dpath, "part0.parquet")):
                os.makedirs(dpath, exist_ok=True)
                rng = np.random.default_rng(1234)
                pq.write_table(
                    make_curate_documents(rng, n, vocab_mult=max(1, n // 10_000)),
                    f"{dpath}/part0.parquet",
                )
            docs = spark.read.parquet(dpath)
            n_bytes = docs.selectExpr("sum(length(text))").collect()[0][0]
            t0 = time.perf_counter()
            out = prepare_rag_corpus(
                docs,
                chunk_tokens=64,
                stride=48,
                embed=_embed,
                dedup_threshold=0.95,
                max_cell_size=1024,
            )
            out.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            retained = out.count()
            from auto_ts_spark.operators.textops import chunk_documents

            total_chunks = chunk_documents(
                docs, chunk_tokens=64, stride=48
            ).count()
            if warm:
                continue
            print(
                json.dumps(
                    {
                        "n_docs": n,
                        "text_mb": round((n_bytes or 0) / 1e6, 1),
                        "wall_s": round(wall, 1),
                        "total_chunks": total_chunks,
                        "retained": retained,
                        "dropped": total_chunks - retained,
                        "loadavg": [round(x, 2) for x in os.getloadavg()],
                    }
                ),
                flush=True,
            )
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
