"""Deterministic sampling / split assignment and corpus vocabulary."""

import math

import pytest
from pyspark.sql import functions as F

from auto_ts_spark.operators import sampling as SAMP
from auto_ts_spark.operators import textops as TOPS


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "doc_id")


def test_hash_split_proportions_and_determinism(spark, ids):
    out = SAMP.hash_split(ids, seed=42)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    # same assignment on a different partitioning (content-addressed)
    again = SAMP.hash_split(ids.repartition(13), seed=42)
    diff = (
        out.select("doc_id", F.col("split").alias("a"))
        .join(again.select("doc_id", F.col("split").alias("b")), "doc_id")
        .filter(F.col("a") != F.col("b"))
        .count()
    )
    assert diff == 0


def test_hash_split_seed_changes_assignment(spark, ids):
    a = SAMP.hash_split(ids, seed=1).select("doc_id", "split")
    b = SAMP.hash_split(ids, seed=2).select("doc_id", F.col("split").alias("split2"))
    moved = a.join(b, "doc_id").filter(F.col("split") != F.col("split2")).count()
    assert moved > 100  # a new seed reshuffles a meaningful share


def test_deterministic_sample_is_subset_stable(spark, ids):
    s1 = {r["doc_id"] for r in SAMP.deterministic_sample(ids, 0.3, seed=7).collect()}
    s2 = {r["doc_id"] for r in SAMP.deterministic_sample(ids.repartition(5), 0.3, seed=7).collect()}
    assert s1 == s2
    assert abs(len(s1) / 2000 - 0.3) < 0.05
    # a larger fraction strictly extends the sample (nested property)
    s_half = {r["doc_id"] for r in SAMP.deterministic_sample(ids, 0.5, seed=7).collect()}
    assert s1 <= s_half


def test_mixture_sample_rates_and_determinism(spark, ids):
    """Per-source epoch weights: r=2.5 emits 2 or 3 copies per doc
    (~2.5x rows), r=0.25 keeps ~25%, unlisted sources drop; the whole
    assignment is content-addressed (identical across runs)."""
    df = ids.withColumn(
        "source",
        F.concat(F.lit("src"), (F.col("doc_id") % 4).cast("string")),
    )
    mixed = SAMP.mixture_sample(df, {"src0": 2.5, "src1": 0.25, "src2": 1.0})
    agg = {
        r["source"]: (r["n_rows"], r["n_docs"])
        for r in mixed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .collect()
    }
    assert "src3" not in agg  # unlisted -> dropped (default_rate 0)
    n0 = 500  # docs per source
    rows0, docs0 = agg["src0"]
    assert docs0 == n0  # upsampling keeps every doc
    assert 2 * n0 < rows0 < 3 * n0 and abs(rows0 - 2.5 * n0) < 0.1 * n0
    rows1, docs1 = agg["src1"]
    assert rows1 == docs1 and abs(docs1 - 0.25 * n0) < 0.1 * n0
    assert agg["src2"] == (n0, n0)
    # copies are numbered 1..k
    copies = mixed.filter(F.col("source") == "src0").groupBy("doc_id").agg(
        F.sort_array(F.collect_list("copy_n")).alias("cs")
    )
    assert all(r["cs"] in ([1, 2], [1, 2, 3]) for r in copies.collect())
    # deterministic: re-running yields the identical multiset
    again = SAMP.mixture_sample(df, {"src0": 2.5, "src1": 0.25, "src2": 1.0})
    assert again.exceptAll(mixed).count() == 0 and mixed.exceptAll(again).count() == 0


def test_corpus_vocabulary_counts(spark):
    docs = spark.createDataFrame(
        [
            (0, "the cat sat"),
            (1, "the cat ran"),
            (2, "a dog ran far"),
        ],
        "doc_id long, text string",
    )
    out = {r["term"]: r for r in TOPS.corpus_vocabulary(docs).collect()}
    assert out["the"]["tf"] == 2 and out["the"]["df"] == 2
    assert out["cat"]["df"] == 2
    assert out["ran"]["tf"] == 2 and out["ran"]["df"] == 2
    assert out["dog"]["df"] == 1
    # smoothed idf, sklearn convention: ln((N+1)/(df+1)) + 1
    assert out["dog"]["idf"] == pytest.approx(math.log(4 / 2) + 1, abs=1e-6)
    assert out["the"]["idf"] == pytest.approx(math.log(4 / 3) + 1, abs=1e-6)
    # min_df prunes the hapax tail
    pruned = {r["term"] for r in TOPS.corpus_vocabulary(docs, min_df=2).collect()}
    assert pruned == {"the", "cat", "ran"}


# ------------------------------------------------- cluster-balanced (r13)


def _clustered_vectors(n_per: int = 40, dim: int = 8, spread: float = 0.05):
    """Four well-separated planted clusters at dyadic corners."""
    import numpy as np

    rs = np.random.RandomState(11)
    corners = np.array(
        [[1.0] * dim, [-1.0] * dim, [1.0, -1.0] * (dim // 2), [-1.0, 1.0] * (dim // 2)]
    )
    rows = []
    for ci, c in enumerate(corners):
        for k in range(n_per):
            v = c + rs.randn(dim) * spread
            rows.append((ci * n_per + k, ci, [float(x) for x in v]))
    return rows, corners


def test_cluster_balanced_explicit_centroids_assignment_and_quota(spark):
    import numpy as np

    rows, corners = _clustered_vectors()
    df = spark.createDataFrame(rows, "vec_id long, planted int, embedding array<double>")
    out = SAMP.cluster_balanced_sample(
        df, 10, centroids=corners, id_col="vec_id"
    ).collect()
    assert len(out) == 40
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster, []).append(r)
        assert r.cluster == r.planted  # separation ≫ spread → exact
    assert sorted(by_cluster) == [0, 1, 2, 3]
    assert all(len(v) == 10 for v in by_cluster.values())


def test_cluster_balanced_partitioning_invariance(spark):
    rows, corners = _clustered_vectors()
    df = spark.createDataFrame(rows, "vec_id long, planted int, embedding array<double>")
    a = {r.vec_id for r in SAMP.cluster_balanced_sample(df, 7, centroids=corners, id_col="vec_id").collect()}
    b = {
        r.vec_id
        for r in SAMP.cluster_balanced_sample(
            df.repartition(13), 7, centroids=corners, id_col="vec_id"
        ).collect()
    }
    assert a == b and len(a) == 28


def test_cluster_balanced_udf_path_matches_hof_path(spark):
    rows, corners = _clustered_vectors()
    df = spark.createDataFrame(rows, "vec_id long, planted int, embedding array<double>")
    hof = SAMP.cluster_balanced_sample(df, 9, centroids=corners, id_col="vec_id")
    udf = SAMP.cluster_balanced_sample(
        df, 9, centroids=corners, id_col="vec_id", hof_max_literals=1
    )
    assert sorted((r.vec_id, r.cluster) for r in hof.collect()) == sorted(
        (r.vec_id, r.cluster) for r in udf.collect()
    )


def test_cluster_balanced_trained_centroids_recover_planted_balance(spark):
    rows, _ = _clustered_vectors()
    df = spark.createDataFrame(rows, "vec_id long, planted int, embedding array<double>")
    out = SAMP.cluster_balanced_sample(
        df, 5, centroids=None, n_centroids=4, id_col="vec_id", sample_size=160
    ).collect()
    # trained Lloyd clusters must align with the planted structure:
    # every learned cluster is pure and the quota holds
    assert len(out) == 20
    purity = {}
    for r in out:
        purity.setdefault(r.cluster, set()).add(r.planted)
    assert len(purity) == 4
    assert all(len(p) == 1 for p in purity.values())


def test_cluster_balanced_small_cluster_keeps_all_and_validates(spark):
    import pytest as _pt

    rows, corners = _clustered_vectors(n_per=3)
    df = spark.createDataFrame(rows, "vec_id long, planted int, embedding array<double>")
    out = SAMP.cluster_balanced_sample(df, 10, centroids=corners, id_col="vec_id")
    assert out.count() == 12  # all rows survive: clusters smaller than quota
    with _pt.raises(ValueError, match="per_cluster"):
        SAMP.cluster_balanced_sample(df, 0, centroids=corners, id_col="vec_id")


def test_cluster_balanced_plan_one_exchange_jvm_only(spark):
    """Plan pin (r13): explicit-centroid assignment is a pure JVM
    projection — no Python eval node — and the only Exchange in the
    whole query is the per-cluster quota window's hash partitioning."""
    import re

    rows, corners = _clustered_vectors()
    df = spark.createDataFrame(rows, "vec_id long, planted int, embedding array<double>")
    out = SAMP.cluster_balanced_sample(df, 10, centroids=corners, id_col="vec_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "EvalPython" not in plan, f"Python in the hot path:\n{plan}"
