"""quality_classifier unit tests: exact fixed-point gradient math on
a hand-computable corpus, separation on a disjoint-vocab corpus, and
determinism across partitionings."""

import math

import pytest
from pyspark.sql import functions as F

from auto_ts_spark.operators import quality_classifier as QC


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_features_fixed_point(spark):
    # "a a b": x(a) = 2/3 -> floor(2/3*1e6+0.5) = 666667; x(b) = 333333
    docs = _docs(spark, [(1, "a a b")])
    feats = {r["bucket"]: r["x_u"] for r in QC.hashed_features(docs).collect()}
    # two token buckets + the intercept row
    assert sorted(feats.values()) == [333333, 666667, 1000000]
    assert feats[QC.BIAS_BUCKET] == 1000000
    # token-less and NULL docs yield no feature rows
    assert QC.hashed_features(_docs(spark, [(2, "!!"), (3, None)])).count() == 0


def test_first_iteration_exact(spark):
    """One positive doc 'a', one negative doc 'b' (disjoint buckets):
    iteration 1 has z=0, p_u=500000, e_u = ±500000 -> per-bucket grad
    g = floor(1.0 * ±500000 + 0.5) = ±500000, step = floor(g/2 + .5)
    = ±250000, so w = ∓... the positive doc's bucket gets +250000."""
    docs = _docs(spark, [(1, "a"), (2, "b")])
    w = QC.train_quality_classifier(
        docs, F.col("doc_id") == 1, n_buckets=8, iters=1, lr=1.0
    )
    by_w = {r["bucket"]: r["w_u"] for r in w.collect()}
    nonzero = sorted(v for v in by_w.values() if v != 0)
    assert nonzero == [-250000, 250000]
    # balanced classes -> the intercept's ±500000 gradient terms
    # cancel exactly
    assert by_w[QC.BIAS_BUCKET] == 0


def test_separable_corpus_learns(spark):
    pos_text = "good clean prose writing style"
    neg_text = "spam junk click buy pills"
    docs = _docs(
        spark,
        [(i, pos_text) for i in range(5)]
        + [(i, neg_text) for i in range(5, 10)],
    )
    w = QC.train_quality_classifier(
        docs, F.col("doc_id") < 5, n_buckets=64, iters=3, lr=4.0
    )
    scored = {r["doc_id"]: r for r in QC.classify(docs, w, n_buckets=64).collect()}
    assert scored[0]["p"] > 0.5 > scored[9]["p"]
    assert scored[0]["keep"] and not scored[9]["keep"]
    # p is the quantized sigmoid of the micro-unit margin
    z = scored[0]["z_micro"]
    want_p = math.floor(1.0 / (1.0 + math.exp(-(z / 1e6))) * 1e6 + 0.5) / 1e6
    assert scored[0]["p"] == want_p


def test_partitioning_invariance(spark):
    docs = _docs(
        spark,
        [(i, f"alpha beta w{i % 7} gamma") for i in range(40)],
    )
    label = F.col("doc_id") % 2 == 0
    w1 = QC.train_quality_classifier(docs.coalesce(1), label, iters=2)
    w8 = QC.train_quality_classifier(docs.repartition(8), label, iters=2)
    assert {tuple(r) for r in w1.collect()} == {tuple(r) for r in w8.collect()}


def test_training_leaves_no_cached_blocks(spark):
    """r7 OOM regression: the labeled feature table must be persisted
    SERIALIZED (deserialized localCheckpoint blocks OOMed an 8g heap
    at 5M docs) and released once training returns."""
    from pyspark.sql import functions as F

    from auto_ts_spark.operators.quality_classifier import (
        train_quality_classifier,
    )

    docs = spark.createDataFrame(
        [(i, f"word{i % 7} text sample number {i}") for i in range(40)],
        "doc_id long, text string",
    )
    # delta-based: the shared test session carries other suites'
    # localCheckpoint blocks, so assert training adds NONE, not that
    # the session is globally clean
    before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    train_quality_classifier(docs, F.col("doc_id") % 2 == 0, iters=2)
    after = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    assert after <= before, (before, after)


def test_entry_query_releases_feature_table_across_runs(spark):
    """r14 (verdict #7): the entry's q_quality_classifier reuses the
    trainer's persisted feature table for scoring (return_features) —
    it must RELEASE it before returning, so repeated library calls in
    one session accumulate no pinned CacheManager blocks. Delta-based
    like the trainer test above: two invocations + actions must leave
    the persistent-RDD count where it started (the eager checkpoint's
    blocks are ContextCleaner-scoped, not CacheManager-pinned, and the
    cache registry — what persist() leaks into — must stay flat)."""
    import __spark_entry__ as E

    sf_dir = "/root/testdata/sf0.001"
    cm = spark._jsparkSession.sharedState().cacheManager()
    # start from a known-clean cache registry (other suites' caches are
    # deterministic recomputes; dropping them only costs time) so the
    # assertion is exact, not a delta
    spark.catalog.clearCache()
    assert cm.isEmpty()
    for _ in range(2):
        out = E.q_quality_classifier(spark, sf_dir)
        out.write.format("noop").mode("overwrite").save()
        del out
    # the trainer's persisted feature table must have been released by
    # the entry query itself; localCheckpoint blocks are RDD-scoped
    # (ContextCleaner) and never enter the CacheManager, so any entry
    # here is a genuine persist leak
    assert cm.isEmpty()
