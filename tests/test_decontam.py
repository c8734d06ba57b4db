"""Benchmark decontamination (operators/decontam.py): planted-overlap
semantics, the drop policy, and broadcast-join plan shape."""

import pandas as pd
from pyspark.sql import functions as F

from auto_ts_spark.operators.decontam import contamination_hits, decontaminate

BENCH = [
    (100, "the quick brown fox jumps over the lazy dog"),
    (101, "pack my box with five dozen liquor jugs"),
]
CORPUS = [
    # contains benchmark 4-grams "the quick brown fox" and
    # "quick brown fox jumps"
    (0, "she saw the quick brown fox jumps again and again"),
    # shares two distinct benchmark 4-grams
    (1, "pack my box with care then pack my box with five dozen liquor jugs"),
    # repeats one contaminated gram many times — still ONE distinct hit
    (2, " ".join(["quick brown fox jumps"] * 30)),
    # clean
    (3, "completely unrelated text about spark catalyst plans"),
    # short doc, no overlap
    (4, "tiny doc"),
]


def _dfs(spark):
    mk = lambda rows: spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]).astype({"doc_id": "int64"})
    )
    return mk(CORPUS), mk(BENCH)


def test_hits_and_distinctness(spark):
    corpus, bench = _dfs(spark)
    hits = (
        contamination_hits(corpus, bench, n=4)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert set(hits.index) == {0, 1, 2}
    assert hits.loc[0, "n_hits"] == 2
    assert hits.loc[0, "first_gram"] == "quick brown fox jumps"  # 'q' < 't'
    # doc 1: "pack my box with" + "my box with five" + "box with five dozen"
    # + "with five dozen liquor" + "five dozen liquor jugs" — all from
    # benchmark doc 101
    assert hits.loc[1, "n_hits"] == 5
    # per-doc dedup: 30 repetitions count once
    assert hits.loc[2, "n_hits"] == 1


def test_decontaminate_drop_policy(spark):
    corpus, bench = _dfs(spark)
    kept = decontaminate(corpus, bench, n=4)
    assert sorted(r.doc_id for r in kept.select("doc_id").collect()) == [3, 4]
    # schema passthrough
    assert kept.columns == corpus.columns
    # permissive threshold keeps single-gram overlaps (doc 0 has two
    # distinct contaminated grams, so it's still dropped)
    kept2 = decontaminate(corpus, bench, n=4, max_hits=1)
    assert sorted(r.doc_id for r in kept2.select("doc_id").collect()) == [2, 3, 4]


def test_empty_documents_do_not_cross_contaminate(spark):
    """An empty/punctuation-only document normalizes to the gram '';
    one such benchmark doc must NOT flag every empty corpus doc as
    contaminated (zero real n-gram overlap)."""
    corpus = spark.createDataFrame(
        [(0, ""), (1, "!!! ???"), (2, "real words about spark plans here")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, ""), (101, "totally different benchmark prose")],
        "doc_id long, text string",
    )
    hits = contamination_hits(corpus, bench, n=4).collect()
    assert hits == []


def test_benchmark_side_broadcasts(spark):
    corpus, bench = _dfs(spark)
    plan = (
        contamination_hits(corpus, bench, n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_sizing_bound_covers_punctuation_heavy_text(spark):
    """The broadcast-sizing token bound must use the gram path's
    normalization: 'a,b,c' is one \\s+ token but three gram-path
    tokens, so a whitespace count is NOT an upper bound on distinct
    grams (regression: r9 ADVICE)."""
    from auto_ts_spark.functions import text as TX
    from auto_ts_spark.operators.decontam import _doc_ngrams

    bench = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [0, 1], "text": ["alpha,beta,gamma,delta", "x;y;z w.q"]}
        )
    )
    n_tok_bound = bench.select(
        F.sum(F.size(TX.tokens(F.col("text")))).alias("t")
    ).first()["t"]
    n_grams = (
        _doc_ngrams(bench, "text", "doc_id", 2).select("gram").distinct().count()
    )
    assert n_tok_bound >= n_grams  # 9 tokens >= 7 distinct 2-grams
    # and the old whitespace count would NOT have been a bound
    ws = bench.select(
        F.sum(F.size(F.split(F.col("text"), r"\s+"))).alias("t")
    ).first()["t"]
    assert ws < n_grams
