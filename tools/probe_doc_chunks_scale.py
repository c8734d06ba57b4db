"""doc_chunks decade probe (r12): chunk_documents standalone at 500k
and 5M docs over the curate-probe fixtures (chunk_tokens=64,
stride=48 — production-ish RAG windows).

The operator is one projection + explode with zero shuffles
(plan-pinned in tests/test_quality_filter.py), so the expected shape
is byte-linear wall and ~n_tokens/stride output rows per doc. Per the
r12 quality-gate finding (BASELINE.md), read the decade ratio in
BYTES: these fixtures grow chars 10.65x per 10x docs.

Usage: python tools/probe_doc_chunks_scale.py [n_docs ...]
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


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [500_000, 5_000_000]
    import numpy as np
    import pyarrow.parquet as pq

    from probe_curate_full_scale import make_curate_documents  # noqa: E402

    from auto_ts_spark import get_spark
    from auto_ts_spark.operators.textops import chunk_documents

    spark = get_spark("probe_doc_chunks_scale")
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
            t0 = time.perf_counter()
            out = chunk_documents(docs, chunk_tokens=64, stride=48)
            out.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            n_chunks = out.count()
            if warm:
                continue
            print(
                json.dumps(
                    {
                        "n_docs": n,
                        "wall_s": round(wall, 1),
                        "n_chunks": n_chunks,
                        "chunks_per_doc": round(n_chunks / n, 3),
                        "loadavg": [round(x, 2) for x in os.getloadavg()],
                    }
                ),
                flush=True,
            )
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
