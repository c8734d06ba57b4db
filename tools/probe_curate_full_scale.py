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

Data: a realism-preserving variant of the gen_testdata recipe (2%
near-dup, 0.2% exact copies, content vocab grown with the corpus via
LETTER suffixes, constant ~8% stopword share — see
make_curate_documents for why digit-suffix growth would zero out the
quality gate) plus a 64-dim embedding per document —
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
from gen_testdata import LANGS, VOCAB  # noqa: E402

_STOPS = ("the", "a", "of", "and", "to", "in", "is", "it")
_CONTENT = [w for w in VOCAB if w not in ("a", "the")]


def _suffix(i: int) -> str:
    s = ""
    while i:
        s += chr(97 + i % 26)
        i //= 26
    return s


def make_curate_documents(
    rng: np.random.Generator,
    n_doc: int,
    vocab_mult: int = 1,
    near_frac: float = 0.02,
    exact_frac: float = 0.002,
) -> pa.Table:
    """Realism-preserving corpus for the FULL-recipe probe: the content
    vocabulary grows with the corpus (letter-suffixed variants, no
    digits) while function words keep a constant ~8% token share — so
    the Gopher gate (stopword_ratio >= 0.02, digit_ratio <= 0.30) sees
    realistic text at every scale AND shingle sparsity still grows
    like a real corpus. gen_testdata.make_documents grows its vocab
    with DIGIT suffixes — fine for the dedup/LM single-op probes, but
    at vocab_mult >= 50 that text fails the stopword and digit rules
    outright, and a probe of curate() would then measure ten stages
    over an empty frame (observed: 5M docs -> quality survivors 0)."""
    vocab = [
        f"{w}{_suffix(i)}" for i in range(max(1, vocab_mult)) for w in _CONTENT
    ]
    varr = np.array(vocab)
    sarr = np.array(_STOPS)
    lens = rng.integers(10, 101, n_doc)
    total = int(lens.sum())
    is_stop = rng.random(total) < 0.08
    content_ix = rng.integers(0, len(vocab), total)
    stop_ix = rng.integers(0, len(_STOPS), total)
    toks = np.where(is_stop, sarr[stop_ix], varr[content_ix])
    texts: list[str] = []
    pos = 0
    for L in lens:
        texts.append(" ".join(toks[pos : pos + L]))
        pos += L
    n_near = int(near_frac * n_doc)
    n_exact = int(exact_frac * n_doc)
    base_pool = n_doc - n_near - n_exact
    for i in range(n_near):
        src = int(rng.integers(0, base_pool))
        t = texts[src].split()
        for _ in range(int(rng.integers(1, 4))):
            t[int(rng.integers(0, len(t)))] = vocab[int(rng.integers(0, len(vocab)))]
        texts[base_pool + i] = " ".join(t)
    for i in range(n_exact):
        texts[base_pool + n_near + i] = texts[int(rng.integers(0, base_pool))]
    perm = rng.permutation(n_doc)
    texts = [texts[i] for i in perm]
    lang_idx = rng.choice(5, n_doc, p=[1 / 3, 1 / 6, 1 / 6, 1 / 6, 1 / 6])
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_doc), pa.int64()),
            "text": texts,
            "lang": pa.array(np.array(LANGS)[lang_idx]),
            "source": pa.array([f"src{s}" for s in rng.integers(0, 20, n_doc)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


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

    # own fixture dir (docs_curate_{n}) — the quality-ops probe shares
    # this workdir with the digit-suffix recipe under docs_{n}; never
    # reuse those (see make_curate_documents)
    dpath = os.path.join(workdir, f"docs_curate_{n_doc}")
    if not os.path.exists(os.path.join(dpath, "part0.parquet")):
        os.makedirs(dpath, exist_ok=True)
        rng = np.random.default_rng(1234)
        pq.write_table(
            make_curate_documents(rng, n_doc, vocab_mult=max(1, n_doc // 10_000)),
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
