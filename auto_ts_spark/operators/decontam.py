"""Benchmark decontamination — flag corpus documents that share word
n-grams with an evaluation/benchmark set, the standard pre-training
hygiene step (the GPT-3 appendix-C / PaLM / Llama "n-gram overlap
with test sets" procedure, run before training so eval numbers stay
meaningful).

Spark-first shape: the benchmark side is the SMALL side by
construction (eval suites are MBs; the corpus is the 100 TB side), so
its distinct n-grams broadcast and the corpus side never shuffles —
one scan, shingle in-expression (no UDF), explode, broadcast-hash
semi/left join, per-doc aggregate. Corpus n-grams are de-duplicated
per document BEFORE the join so a pathological document repeating one
contaminated n-gram a million times still emits it once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from auto_ts_spark.functions import text as TX
from auto_ts_spark.operators.partitioning import ensure_parallelism

# benchmark-gram join cutover (same size-aware rule as
# lm_quality.BROADCAST_MAX_ROWS / encoders.BROADCAST_MAX_CODES):
# ~5M grams ≈ low hundreds of MB broadcast — beyond it, shuffle
BROADCAST_MAX_GRAMS = 5_000_000


def _doc_ngrams(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, gram) — distinct word n-grams per document; documents
    shorter than n words contribute their whole text as one gram
    (TX.shingles' short-document convention). Empty grams are dropped:
    an empty/punctuation-only document normalizes to the gram '', and
    without the filter ONE empty benchmark document would mark every
    empty corpus document contaminated despite zero real overlap."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(TX.shingles(F.col(text_col), n))
            ).alias("gram"),
        )
        .filter(F.col("gram") != "")
    )


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Per-document contamination profile against ``benchmark``.

    Returns one row per CORPUS document that shares at least one word
    ``n``-gram with any benchmark document:
    ``(doc_id, n_hits, first_gram)`` where ``n_hits`` counts distinct
    contaminated n-grams and ``first_gram`` is the lexicographically
    smallest one (deterministic evidence sample).

    The benchmark gram set is globally distinct and joined size-aware
    (r9): broadcast below ``BROADCAST_MAX_GRAMS`` (the typical case —
    benchmark suites are tiny next to the corpus), shuffle-join on the
    gram key above it (a full eval-suite union can reach tens of
    millions of grams; a forced broadcast of an unbounded side is a
    scale ceiling). The corpus side is the only large scan either way
    and it shuffles once, on ``doc_id``, for the final per-doc
    aggregate; the sizing count is one cheap job over the small side."""
    bench_grams = (
        _doc_ngrams(benchmark, text_col, id_col, n).select("gram").distinct()
    )
    # sizing probe: distinct grams <= total tokens, and the token sum
    # is one shuffle-free scan of the small side (counting the grams
    # themselves would pay the explode+distinct shuffle twice). The
    # count MUST use the same normalization as the gram path
    # (TX.tokens' [^a-z0-9]+ split): whitespace-splitting undercounts
    # punctuation-joined text ("a,b" is two grams but one \s+ token),
    # which would broadcast punctuation-heavy suites past the cutoff.
    n_tok_bound = (
        benchmark.select(
            F.sum(F.size(TX.tokens(F.col(text_col)))).alias("t")
        ).first()["t"]
        or 0
    )
    bench_grams = (
        F.broadcast(bench_grams)
        if n_tok_bound < BROADCAST_MAX_GRAMS
        else bench_grams.hint("merge")
    )
    # the shingle explode is the CPU-bound stage: spread an
    # under-partitioned corpus (one small file locally) across cores —
    # a no-op at scale where the scan already has enough partitions
    corp = _doc_ngrams(ensure_parallelism(corpus), text_col, id_col, n)
    return (
        corp.join(bench_grams, "gram")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hits"),
            F.min("gram").alias("first_gram"),
        )
        .select(F.col("id").alias(id_col), "n_hits", "first_gram")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    max_hits: int = 0,
) -> DataFrame:
    """Drop corpus documents with more than ``max_hits`` contaminated
    n-grams (default: any overlap removes the document — the
    conservative pre-training policy). Left-anti join against the
    hit list, so clean documents stream through untouched."""
    dirty = contamination_hits(
        corpus, benchmark, text_col=text_col, id_col=id_col, n=n
    ).filter(F.col("n_hits") > max_hits)
    return corpus.join(dirty.select(id_col), id_col, "left_anti")
