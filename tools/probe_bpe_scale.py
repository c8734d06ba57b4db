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
  env BPE_SYNTH_WORDS: run the DEPTH probe instead — the curate
  fixtures top out at ~13.5k distinct words (merges exhaust near 14k,
  r11 measured), so production merge depth needs a
  vocabulary-realistic histogram: this mode builds a synthetic Zipf
  histogram of that many distinct words driver-side, times
  `_driver_bpe` at BPE_MERGES depth (the claim under test: per-merge
  cost is bounded by touched words, not vocabulary scans), then
  tokenizes the LARGEST fixture with the trained table (broadcast +
  per-batch cache behavior under a real 32k-rank table).
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


def synth_histogram(n_words: int, seed: int = 7) -> list[tuple[str, int]]:
    """Deterministic Zipf histogram of ``n_words`` distinct a-z words
    (lengths 3-12, letter frequencies English-ish so merges stay
    meaningful deep into the loop), counts c_i ~ 1e9 / rank."""
    import numpy as np

    rng = np.random.default_rng(seed)
    letters = np.array(list("etaoinshrdlucmfwypvbgkjqxz"))
    probs = np.array([0.127, 0.091, 0.082, 0.075, 0.070, 0.067, 0.063,
                      0.061, 0.060, 0.043, 0.040, 0.028, 0.028, 0.024,
                      0.024, 0.024, 0.020, 0.019, 0.015, 0.010, 0.009,
                      0.008, 0.002, 0.002, 0.002, 0.001])
    probs = probs / probs.sum()
    words: set[str] = set()
    out: list[str] = []
    while len(out) < n_words:
        batch = rng.choice(letters, size=(n_words // 4 + 1000, 12), p=probs)
        lens = rng.integers(3, 13, size=batch.shape[0])
        for row, ln in zip(batch, lens):
            w = "".join(row[:ln])
            if w not in words:
                words.add(w)
                out.append(w)
                if len(out) == n_words:
                    break
    return [(w, max(1, int(1_000_000_000 / (i + 1)))) for i, w in enumerate(out)]


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [500_000, 5_000_000]
    import numpy as np
    import pyarrow.parquet as pq

    from probe_curate_full_scale import make_curate_documents  # noqa: E402

    from auto_ts_spark import get_spark
    from auto_ts_spark.operators import bpe as BPE

    spark = get_spark("probe_bpe_scale")
    workdir = "/root/repo/.localdata/probe_docs"

    if os.environ.get("BPE_SYNTH_WORDS"):
        n_words = int(os.environ["BPE_SYNTH_WORDS"])
        n_merges = int(os.environ.get("BPE_MERGES", "32000"))
        words = synth_histogram(n_words)
        t0 = time.perf_counter()
        merges = BPE._driver_bpe(words, n_merges, min_pair_count=2)
        t_train = time.perf_counter() - t0
        n = sizes[-1]
        dpath = os.path.join(workdir, f"docs_curate_{n}")
        docs = spark.read.parquet(dpath)
        t0 = time.perf_counter()
        tok = BPE.bpe_tokenize(docs, merges)
        tok.write.format("noop").mode("overwrite").save()
        t_tok = time.perf_counter() - t0
        import resource as R

        print(
            json.dumps(
                {
                    "mode": "depth",
                    "n_synth_words": n_words,
                    "n_merges": len(merges),
                    "merge_loop_s": round(t_train, 1),
                    "tokenize_docs": n,
                    "tokenize_s": round(t_tok, 1),
                    "driver_maxrss_mb": R.getrusage(R.RUSAGE_SELF).ru_maxrss // 1024,
                    "loadavg": [round(x, 2) for x in os.getloadavg()],
                }
            ),
            flush=True,
        )
        spark.stop()
        return
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
