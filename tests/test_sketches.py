"""Misra-Gries heavy hitters (operators/sketches.py) and exact
stratified sampling (operators/sampling.py): the exact regime is
oracle-checked by the driver; these tests force the regimes the oracle
can't reach — deflation under adversarial capacity, the error
certificate, and the survivor guarantee."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from auto_ts_spark.functions import text as TX
from auto_ts_spark.operators.sampling import stratified_sample
from auto_ts_spark.operators.sketches import _mg_merge, approx_heavy_hitters


# ------------------------------------------------------------- _mg_merge


def test_mg_merge_no_deflation_below_capacity():
    s, d = _mg_merge(None, pd.Series({"a": 5, "b": 3}), capacity=4)
    assert d == 0 and s.to_dict() == {"a": 5, "b": 3}
    s, d = _mg_merge(s, pd.Series({"b": 2, "c": 1}), capacity=4)
    assert d == 0 and s.to_dict() == {"a": 5, "b": 5, "c": 1}


def test_mg_merge_deflation_matches_classic_guarantee():
    # 6 terms, capacity 3: d = 4th-largest count; survivors = top3 - d
    counts = pd.Series({"a": 10, "b": 8, "c": 6, "d": 4, "e": 2, "f": 1})
    s, d = _mg_merge(None, counts, capacity=3)
    assert d == 4
    assert s.to_dict() == {"a": 6, "b": 4, "c": 2}
    # every estimate underestimates by exactly <= d
    for t, est in s.items():
        assert counts[t] - d == est


def test_mg_merge_tie_at_boundary_drops_tied_terms():
    counts = pd.Series({"a": 5, "b": 3, "c": 3, "d": 3})
    s, d = _mg_merge(None, counts, capacity=2)
    assert d == 3
    assert s.to_dict() == {"a": 2}  # ties at d deflate to zero → dropped


# ------------------------------------------------- approx_heavy_hitters


def _exact_counts(docs, ngram=1):
    terms = (
        TX.tokens(F.col("text")) if ngram == 1 else TX.shingles(F.col("text"), ngram)
    )
    rows = (
        docs.select(F.explode(terms).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .count()
        .collect()
    )
    return {r["term"]: r["count"] for r in rows}


def test_exact_regime_equals_exact_topk(spark, sf_dir):
    from auto_ts_spark.io.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = approx_heavy_hitters(docs, k=10, capacity=100_000).collect()
    exact = sorted(_exact_counts(docs).items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["term"], r["est_count"]) for r in got] == exact
    assert all(r["max_undercount"] == 0 and r["exact"] for r in got)


def test_adversarial_deflation_certificate(spark, sf_dir):
    """Tiny capacity forces deflation every batch; the certificate
    est <= true <= est + max_undercount must hold for every reported
    term, and exact must flip off."""
    from auto_ts_spark.io.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    true = _exact_counts(docs, ngram=2)
    got = approx_heavy_hitters(docs, k=10, capacity=12, ngram=2).collect()
    assert got, "summary must survive deflation"
    u = got[0]["max_undercount"]
    assert u > 0
    for r in got:
        assert r["max_undercount"] == u  # one global certificate
        assert not r["exact"]
        t = true[r["term"]]
        assert r["est_count"] <= t <= r["est_count"] + u, (r, t)


def test_survivor_guarantee_with_planted_heavy_term(spark):
    """A term heavier than the total deflation must survive any
    capacity — plant one at ~40% of the stream mass."""
    rows = [("x y z w v u t s r q",)] * 30 + [("heavy " * 20,)] * 20
    df = spark.createDataFrame(rows, ["text"]).repartition(8)
    got = approx_heavy_hitters(df, k=5, capacity=5).collect()
    assert got[0]["term"] == "heavy"
    true_heavy = 20 * 20
    u = got[0]["max_undercount"]
    assert got[0]["est_count"] <= true_heavy <= got[0]["est_count"] + u


def test_capacity_below_k_raises(spark):
    df = spark.createDataFrame([("a b",)], ["text"])
    with pytest.raises(ValueError, match="capacity"):
        approx_heavy_hitters(df, k=10, capacity=5)


# ------------------------------------------------------ stratified_sample


def test_stratified_exact_counts_and_stability(spark, sf_dir):
    from auto_ts_spark.io.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(docs, 7, strata_col="source")
    per = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    sizes = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for s, n in per.items():
        assert n == min(7, sizes[s]), s
    # content-addressed: identical selection under a different partitioning
    ids1 = {r["doc_id"] for r in out.select("doc_id").collect()}
    ids2 = {
        r["doc_id"]
        for r in stratified_sample(docs.repartition(17), 7, strata_col="source")
        .select("doc_id")
        .collect()
    }
    assert ids1 == ids2
    # different seed → different selection (overwhelmingly)
    ids3 = {
        r["doc_id"]
        for r in stratified_sample(docs, 7, strata_col="source", seed=7)
        .select("doc_id")
        .collect()
    }
    assert ids1 != ids3


def test_stratified_keeps_all_when_stratum_small(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 3 else "b") for i in range(10)], ["doc_id", "source"]
    )
    out = stratified_sample(df, 5, strata_col="source")
    per = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per == {"a": 3, "b": 5}
