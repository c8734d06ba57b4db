"""BPE tokenizer decade probe (r10).

Measures the full train→tokenize path at 500k and 5M docs over the
curate-probe fixtures (vocabulary grows with the corpus: ~10k content
words per 100k docs): `word_histogram` is the only corpus-scale pass,
`train_bpe`'s driver merge loop runs over the vocabulary-sized
histogram (coverage-measured cap), and `bpe_tokenize` is the
Arrow-batched distributed encode (forced through the noop sink).

The design claim under test: train wall is dominated by ONE corpus
aggregation + a vocabulary-sized driver loop (so 10x docs ≈ the
aggregation's growth, NOT 10x merge work), and tokenize is linear in
corpus size with the merge table broadcast.

Usage: python tools/probe_bpe_scale.py [n_docs ...]
  default: 500000 5000000   (fixtures from tools/probe_curate_full_scale.py)
  env BPE_MERGES: merge depth (default 1000; r11 runs 32000 — the
  production-tokenizer regime, exercising the lazy-heap argmax and
  the 32k-entry broadcast merge table)
Prints one JSON line per scale, including driver max-RSS.
"""

from __future__ import annotations

import json
import os
import resource
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
    from auto_ts_spark.operators import bpe as BPE

    spark = get_spark("probe_bpe_scale")
    workdir = "/root/repo/.localdata/probe_docs"
    for n in sizes:
        dpath = os.path.join(workdir, f"docs_curate_{n}")
        if not os.path.exists(os.path.join(dpath, "part0.parquet")):
            os.makedirs(dpath, exist_ok=True)
            rng = np.random.default_rng(1234)
            pq.write_table(
                make_curate_documents(rng, n, vocab_mult=max(1, n // 10_000)),
                f"{dpath}/part0.parquet",
            )
        docs = spark.read.parquet(dpath)
        n_merges = int(os.environ.get("BPE_MERGES", "1000"))
        t0 = time.perf_counter()
        merges, stats = BPE.train_bpe(docs, n_merges=n_merges, max_words=2_000_000)
        t_train = time.perf_counter() - t0
        t0 = time.perf_counter()
        tok = BPE.bpe_tokenize(docs, merges)
        tok.write.format("noop").mode("overwrite").save()
        t_tok = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "n_docs": n,
                    "train_s": round(t_train, 1),
                    "tokenize_s": round(t_tok, 1),
                    "n_words": stats["n_words_total"],
                    "coverage": round(stats["coverage"], 6),
                    "n_merges": stats["n_merges"],
                    "driver_maxrss_mb": resource.getrusage(
                        resource.RUSAGE_SELF
                    ).ru_maxrss
                    // 1024,
                    "loadavg": [round(x, 2) for x in os.getloadavg()],
                }
            ),
            flush=True,
        )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
