"""Mergeable-summary sketches for corpus statistics at bounded state.

``approx_heavy_hitters``: Misra-Gries top-k terms with BOUNDED
per-worker state and BOUNDED shuffle, for universes where exact
counting stops scaling. The exact path (``textops.corpus_vocabulary``)
shuffles one row per distinct term per partition — the right plan for
word vocabularies, but at 100 TB an n-gram universe has trillions of
distinct keys and the exact shuffle IS the job. The Misra-Gries
summary (the classic frequent-elements algorithm; mergeability per
Agarwal et al., "Mergeable Summaries", PODS 2012 — public literature)
caps each partition's contribution at ``capacity`` counters, so the
shuffle volume is capacity × partitions regardless of the universe,
and the result carries its own error certificate:

- every reported ``est_count`` UNDERestimates: est ≤ true;
- the total undercount is bounded by the summary's recorded
  deflations: true ≤ est + max_undercount;
- any term whose true count exceeds ``max_undercount`` is guaranteed
  to be present in the merged summary (so the top-k is trustworthy
  down to that threshold);
- when no partition ever exceeds ``capacity`` distinct terms the
  deflation never fires, ``max_undercount`` is 0 and the result is
  EXACT — which is how the DuckDB oracle value-checks this operator at
  test scale while a pytest forces deflation adversarially and checks
  the bound.

Implementation shape: tokens explode JVM-side; the per-partition
summary runs in ``mapInPandas`` with fully vectorized batch merges
(pandas ``value_counts`` + indexed add + ``nlargest`` deflation — no
per-row Python). Merging across partitions is a plain groupBy-sum
(MG summaries merge by pointwise addition followed by deflation;
skipping the final deflation only loosens nothing — estimates stay
conservative and the error certificate still holds). The final rank
runs on a frame of at most capacity × partitions rows — a declared
bounded window (``partitioning.bounded_window_key``)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from auto_ts_spark.functions import text as TX
from auto_ts_spark.operators import partitioning as PART


def _mg_merge(
    summary: "pd.Series | None", batch_counts: pd.Series, capacity: int
) -> tuple[pd.Series, int]:
    """Merge exact batch counts into a Misra-Gries summary, deflating
    back to ``capacity`` counters. Returns (summary, deflation_delta).
    Deflation d is the smallest offset such that at most ``capacity``
    counters stay positive; subtracting it from every counter is the
    batched equivalent of d rounds of the classic decrement step."""
    merged = (
        batch_counts
        if summary is None
        else summary.add(batch_counts, fill_value=0)
    )
    if len(merged) <= capacity:
        return merged, 0
    merged = merged.sort_values(ascending=False, kind="stable")
    d = int(merged.iloc[capacity])
    merged = merged.iloc[:capacity] - d
    return merged[merged > 0], d


def approx_heavy_hitters(
    df: DataFrame,
    *,
    text_col: str = "text",
    k: int = 20,
    capacity: int = 4096,
    ngram: int = 1,
) -> DataFrame:
    """Top-``k`` corpus terms (words, or word ``ngram``-shingles — the
    universe that actually explodes at scale) by (under)estimated count
    with a per-result error certificate: (term, est_count,
    max_undercount, exact). Deterministic order: est_count desc,
    term asc."""
    if capacity < k:
        raise ValueError(f"capacity {capacity} must be >= k {k}")
    terms = (
        TX.tokens(F.col(text_col))
        if ngram == 1
        else TX.shingles(F.col(text_col), ngram)
    )
    toks = df.select(F.explode(terms).alias("term")).filter(F.col("term") != "")

    out_schema = "term string, est long, defl long"

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: pd.Series | None = None
        defl_total = 0
        for pdf in batches:
            counts = pdf["term"].value_counts()
            summary, d = _mg_merge(summary, counts, capacity)
            defl_total += d
        rows = (
            pd.DataFrame(
                {
                    "term": summary.index.astype(str),
                    "est": summary.values.astype("int64"),
                }
            )
            if summary is not None and len(summary)
            else pd.DataFrame({"term": pd.Series([], dtype=str), "est": pd.Series([], dtype="int64")})
        )
        rows["defl"] = 0
        sentinel = pd.DataFrame({"term": [None], "est": [0], "defl": [defl_total]})
        yield pd.concat([rows, sentinel], ignore_index=True)

    summaries = toks.mapInPandas(summarize, out_schema)
    merged = summaries.groupBy("term").agg(
        F.sum("est").alias("est_count"), F.sum("defl").alias("defl")
    )
    # bounded by construction: <= capacity x partitions (+1 sentinel) rows
    w = Window.partitionBy(PART.bounded_window_key("term"))
    ranked = (
        merged.withColumn("max_undercount", F.sum("defl").over(w))
        .filter(F.col("term").isNotNull())
        .select(
            "term",
            "est_count",
            "max_undercount",
            (F.col("max_undercount") == 0).alias("exact"),
        )
    )
    return ranked.orderBy(F.desc("est_count"), "term").limit(k)
