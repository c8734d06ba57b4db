"""Dedup + similarity operators: planted-duplicate recovery and
LSH-vs-brute-force recall."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from auto_ts_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def planted_docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest to find food for the long cold winter"
    )
    near = base.replace("cold winter", "cold snowy winter")  # near-dup of 0
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, near),  # near dup of 0
        (3, "completely different text about spark dataframes and shuffles here"),
        (4, "another unrelated document mentioning query optimizers and joins"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates_found(planted_docs):
    groups = dedup.exact_duplicates(planted_docs).collect()
    assert len(groups) == 1
    assert groups[0]["dup_ids"] == [0, 1]


def test_dedup_exact_keeps_min_id(planted_docs):
    kept = dedup.dedup_exact(planted_docs)
    ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    assert ids == [0, 2, 3, 4]


def test_ngram_jaccard_finds_near_dup(planted_docs):
    pairs = dedup.ngram_jaccard_pairs(planted_docs, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got
    assert not any(3 in p or 4 in p for p in got)


def test_minhash_lsh_finds_near_dup(planted_docs):
    pairs = dedup.minhash_lsh_pairs(planted_docs, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in got and (0, 2) in got


def test_minhash_bucket_cap_drops_flood_keeps_true_pairs(spark):
    """max_bucket_size: a flood of identical documents (one giant LSH
    bucket, the documented hot-bucket skew mode) is dropped before its
    member list materializes, while a genuine near-dup pair in a small
    bucket is still found. Uncapped, the flood yields O(k²) pairs."""
    base = "the quick brown fox jumps over the lazy dog every single day"
    near = "the quick brown fox jumps over the lazy cat every single day"
    flood = "spam spam spam identical boilerplate footer text repeated everywhere"
    rows = [(0, base), (1, near)] + [(10 + i, flood) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = dedup.minhash_lsh_pairs(df, threshold=0.5, max_bucket_size=5).collect()
    got = {(r["id_a"], r["id_b"]) for r in capped}
    assert (0, 1) in got
    assert not any(a >= 10 or b >= 10 for a, b in got)

    uncapped = dedup.minhash_lsh_pairs(df, threshold=0.5).collect()
    flood_pairs = {
        (r["id_a"], r["id_b"]) for r in uncapped if r["id_a"] >= 10
    }
    assert len(flood_pairs) == 20 * 19 // 2  # the quadratic blow-up the cap avoids

    # the guard is a window over the shuffle key, NOT a self-join —
    # the shingle/md5 signature pipeline must still run exactly once
    # (one source scan, one md5 chain in the plan)
    plan = (
        dedup.minhash_lsh_pairs(df, threshold=0.5, max_bucket_size=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for join_op in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"):
        assert join_op not in plan
    n_scans = plan.count("Scan ExistingRDD") + plan.count("LocalTableScan")
    assert n_scans == 1, plan


def test_simhash_exact_dup_distance_zero(planted_docs):
    pairs = dedup.simhash_pairs(planted_docs, max_hamming=3).collect()
    d = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert d[(0, 1)] == 0


def test_connected_components_chain_converges(spark):
    """A path graph (diameter 3) forces label propagation past one
    round; a disjoint pair must keep its own min label."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    lab = {r["id"]: r["cluster_id"] for r in dedup.connected_components(pairs).collect()}
    assert lab == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_strategies_agree(spark):
    """r9 adaptive CC: the distributed pointer-jumping propagation and
    the small-graph union-find must produce IDENTICAL labels on the
    same graph — long chains (the jumping stressor), cliques, isolated
    pairs, and string-keyed ids."""
    import random

    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(200)]  # diameter-200 chain
    edges += [(1000 + a, 1000 + b) for a in range(10) for b in range(a)]
    edges += [(2000, 2001), (3000, 3001)]
    edges += [(rng.randrange(4000, 4400), rng.randrange(4000, 4400)) for _ in range(300)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    uf = {
        r["id"]: r["cluster_id"]
        for r in dedup.connected_components(pairs).collect()
    }
    st: dict = {}
    dist = {
        r["id"]: r["cluster_id"]
        for r in dedup.connected_components(
            pairs, driver_max_edges=0, stats=st
        ).collect()
    }
    assert uf == dist
    # O(log diameter): log2(200) ≈ 8 plus a few min-redirect rounds
    # and the convergence detect — NOT ~200 (pure propagation)
    assert st["rounds"] <= 15
    # string ids: min is lexicographic on both paths
    spairs = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "id_a string, id_b string"
    )
    ufs = {r["id"]: r["cluster_id"] for r in dedup.connected_components(spairs).collect()}
    dss = {
        r["id"]: r["cluster_id"]
        for r in dedup.connected_components(spairs, driver_max_edges=0).collect()
    }
    assert ufs == dss == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_dedup_clusters_keep_one_per_component(planted_docs):
    """0∼1, 0∼2 (and maybe 1∼2): all three land in ONE cluster with a
    single canonical keeper — pairwise output alone would keep two."""
    out = dedup.dedup_clusters(planted_docs, threshold=0.5).collect()
    rows = {r["doc_id"]: r for r in out}
    assert set(rows) == {0, 1, 2}
    assert all(r["cluster_id"] == 0 for r in out)
    assert all(r["cluster_size"] == 3 for r in out)
    assert [d for d, r in rows.items() if r["is_keep"]] == [0]


@pytest.fixture(scope="module")
def planted_vectors(spark):
    rng = np.random.RandomState(3)
    vecs = rng.randn(50, 16).astype(np.float32)
    vecs[7] = vecs[0] + rng.randn(16).astype(np.float32) * 0.01  # near-dup of 0
    rows = [(i, [float(x) for x in vecs[i]], int(i % 5)) for i in range(50)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_brute_force_topk_finds_planted_neighbor(planted_vectors):
    q = planted_vectors.filter(F.col("vec_id") == 0)
    out = similarity.brute_force_topk(planted_vectors, q, k=3).collect()
    assert out[0]["neighbor_id"] == 7
    assert out[0]["cosine"] > 0.99


def test_lsh_topk_recall_against_brute_force(planted_vectors):
    q = planted_vectors.filter(F.col("vec_id") < 5)
    bf = similarity.brute_force_topk(planted_vectors, q, k=3)
    ann = similarity.lsh_topk(planted_vectors, q, k=3, n_planes=4, n_tables=8)
    bf_pairs = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
    ann_pairs = {(r["query_id"], r["neighbor_id"]) for r in ann.collect()}
    recall = len(bf_pairs & ann_pairs) / len(bf_pairs)
    assert recall >= 0.5  # multi-table LSH should catch most true top-3


def test_embedding_near_dup_pairs(planted_vectors):
    pairs = similarity.embedding_near_dup_pairs(
        planted_vectors, threshold=0.99, n_tables=8, n_planes=4
    ).collect()
    assert any({r["id_a"], r["id_b"]} == {0, 7} for r in pairs)


def test_language_id_deterministic(spark):
    from auto_ts_spark.operators.textops import language_id

    docs = spark.createDataFrame(
        [
            (0, "the cat and the dog in the house"),
            (1, "el gato y la casa de la madre es por un camino"),
            (2, "xyzzy plugh qwerty"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["pred_lang"] for r in language_id(docs).collect()}
    assert out[0] == "en"
    assert out[1] == "es"
    assert out[2] == "und"


class TestIVF:
    def test_full_probe_equals_brute_force(self, spark):
        from auto_ts_spark.operators.similarity import brute_force_topk, ivf_topk
        from auto_ts_spark.io.sources import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        q = emb.filter(F.col("vec_id") < 5)
        exact = brute_force_topk(emb, q, k=5).toPandas()
        # probing every cell degenerates to exact search
        full = ivf_topk(emb, q, k=5, n_centroids=8, n_probe=8).toPandas()
        key = ["query_id", "rank"]
        pd.testing.assert_frame_equal(
            exact.sort_values(key).reset_index(drop=True),
            full.sort_values(key).reset_index(drop=True),
        )

    def test_partial_probe_recall(self, spark):
        from auto_ts_spark.operators.similarity import brute_force_topk, ivf_topk
        from auto_ts_spark.io.sources import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        q = emb.filter(F.col("vec_id") < 10)
        exact = brute_force_topk(emb, q, k=5).toPandas()
        approx = ivf_topk(emb, q, k=5, n_centroids=8, n_probe=3).toPandas()
        exact_pairs = set(zip(exact.query_id, exact.neighbor_id))
        approx_pairs = set(zip(approx.query_id, approx.neighbor_id))
        recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
        assert recall >= 0.2  # random embeddings cluster weakly; sanity floor
        # every query returns k rows (cells are dense enough)
        assert (approx.groupby("query_id").size() == 5).all()


def test_audio_features_shape(spark):
    from auto_ts_spark.operators.multimodal import audio_features, synthetic_media

    media = synthetic_media(spark, 16, kind="audio")
    out = audio_features(media).toPandas()
    assert len(out) == 16
    # real WAV path: payloads are 0.5-amplitude sines, so rms is within
    # quantization error of 0.5/sqrt(2); sample count comes from the
    # RIFF data chunk and must match duration_ms * sample_rate / 1000
    assert (abs(out["rms"] - 0.5 / np.sqrt(2)) < 1e-3).all()
    expected_n = 16000 * (1000 + out["media_id"]) // 1000
    assert (out["n_samples"] == expected_n).all()
    # deterministic across runs
    out2 = audio_features(media).toPandas()
    pd.testing.assert_frame_equal(
        out.sort_values("media_id").reset_index(drop=True),
        out2.sort_values("media_id").reset_index(drop=True),
    )


def test_resize_images_real_nearest_neighbor(spark):
    """resize_images on real payloads (the BMP/JPEG/PNG/GIF schedule):
    output is itself a decodable BMP whose pixels are the exact
    nearest-neighbor index sample of what the REAL codec decode of the
    source payload produces (JPEG is lossy, GIF palettized — so the
    reference is the decoded payload, not the generator array)."""
    from auto_ts_spark.operators.multimodal import (
        _image_payload,
        decode_bmp,
        decode_image,
        resize_images,
        synthetic_media,
    )

    media = synthetic_media(spark, 4, kind="image")
    out = resize_images(media, width=16, height=12).toPandas()
    assert len(out) == 4 and (out["width"] == 16).all()
    for row in out.itertuples(index=False):
        src = decode_image(_image_payload(row.media_id)[0])
        img = decode_bmp(bytes(row.content))
        ys = (np.arange(12) * src.shape[0]) // 12
        xs = (np.arange(16) * src.shape[1]) // 16
        assert np.array_equal(img, src[ys][:, xs])


def test_decode_and_featurize_real_vs_fake_paths(spark):
    """The featurizer's output equals a local decode of the same
    payload bit-exactly (real codecs all the way down; JPEG rows are
    lossy but deterministic, so the reference is the decoded payload)
    while real=False payloads route to the documented fake fallback."""
    from auto_ts_spark.operators.multimodal import (
        _image_payload,
        decode_and_featurize,
        decode_image,
        synthetic_media,
    )

    real = decode_and_featurize(synthetic_media(spark, 3, kind="image")).toPandas()
    for row in real.itertuples(index=False):
        src = decode_image(_image_payload(row.media_id)[0]).astype(np.float64)
        assert abs(row.mean_r - src[:, :, 0].mean()) < 1e-12
        assert abs(row.std_gray - src.mean(axis=2).std()) < 1e-12
    fake = decode_and_featurize(
        synthetic_media(spark, 3, kind="image", real=False)
    ).toPandas()
    # fallback produces different (seeded-fake) features, same schema
    assert set(fake.columns) == set(real.columns) and len(fake) == 3
    assert not np.allclose(
        fake.sort_values("media_id")["mean_r"].to_numpy(),
        real.sort_values("media_id")["mean_r"].to_numpy(),
    )


def test_winnow_guarantee_on_planted_overlap(spark):
    """Winnowing's contract: any shared token run of length
    k + window - 1 (= 7 here) yields at least one shared fingerprint;
    disjoint-vocabulary docs share none."""
    from auto_ts_spark.operators import dedup as DD

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens
    rows = [
        (1, f"one two three {shared} four five six"),
        (2, f"seven eight nine ten {shared} eleven twelve"),
        (3, "completely different vocabulary with no overlap here at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = DD.winnow_overlap_pairs(
        docs, k=4, window=4, min_shared=1, max_df=20
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_ivf_centroids_cap_at_corpus_size(spark):
    """n_centroids larger than the corpus must cap (one cell per
    vector), not crash the driver-side sampler."""
    from auto_ts_spark.operators.similarity import ivf_topk

    emb = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5)]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    out = ivf_topk(emb, emb.filter("vec_id < 2"), k=2, n_centroids=16, n_probe=16)
    assert out.count() > 0


def test_jaccard_nonpositive_threshold_rejected(planted_docs):
    """The inverted-index candidate stage can only surface pairs
    sharing >= 1 shingle, so threshold <= 0 (which would owe
    Jaccard-0 pairs) must raise instead of silently under-reporting."""
    import pytest as _pytest

    for bad in (0.0, -0.5):
        with _pytest.raises(ValueError, match="threshold > 0"):
            dedup.ngram_jaccard_pairs(planted_docs, threshold=bad)


def test_ivf_assign_layout_invariant(spark):
    """The quantizer sample is picked by seeded id-hash order, so cell
    assignments must not change when the input is repartitioned."""
    import numpy as np

    from auto_ts_spark.operators.similarity import ivf_assign

    rng = np.random.RandomState(7)
    rows = [
        (i, rng.randn(8).tolist()) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = {
        r["id"]: r["cell"]
        for r in ivf_assign(df, n_centroids=4, sample_size=64).collect()
    }
    shuffled = {
        r["id"]: r["cell"]
        for r in ivf_assign(
            df.repartition(13, "vec_id"), n_centroids=4, sample_size=64
        ).collect()
    }
    assert base == shuffled


def test_ivf_auto_sizes_centroids(spark):
    """n_centroids=None must scale the quantizer with the corpus
    (fixed k=16 over a large corpus makes the within-cell pair join
    quadratic): floor at 16 for small inputs, ~n/512 beyond it."""
    import numpy as np

    from auto_ts_spark.operators.similarity import ivf_assign

    rng = np.random.RandomState(3)
    small = spark.createDataFrame(
        [(i, rng.randn(4).tolist()) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    cells_small = {
        r["cell"] for r in ivf_assign(small, n_centroids=None).collect()
    }
    assert len(cells_small) <= 16  # floor applies; kmeans caps at data

    big = spark.createDataFrame(
        [(i, rng.randn(4).tolist()) for i in range(20_000)],
        "vec_id long, embedding array<double>",
    )
    cells_big = {
        r["cell"] for r in ivf_assign(big, n_centroids=None).collect()
    }
    # ceil(20000/512) = 40 target cells; k-means may leave a few empty
    assert len(cells_big) > 20


def test_vec_storage_level_is_size_aware(spark):
    """r10: frames past ~1 GB estimated persist DISK_ONLY (bounded
    heap while materializing wide-array caches — the 5M-vector probe
    OOM'd an 8g JVM on the in-memory level); small frames keep the
    fast MEMORY_AND_DISK cache. Compile-time stats only, no job."""
    from pyspark import StorageLevel

    from auto_ts_spark.operators.similarity import vec_storage_level

    small = spark.range(10)
    big = spark.range(500_000_000)  # 8 B/row estimate -> ~4 GB, never executed
    assert vec_storage_level(small) == StorageLevel.MEMORY_AND_DISK
    assert vec_storage_level(big) == StorageLevel.DISK_ONLY
    # r13 (prepare_rag_corpus decade probe OOM): Generate/explode in
    # the lineage keeps Catalyst's estimate at the tiny PRE-explode
    # size, so the estimate is distrusted -> spill-safe DISK_ONLY even
    # though the compile-time number reads "small"
    from pyspark.sql import functions as F

    exploded = small.select(
        F.explode(F.sequence(F.lit(0), F.lit(1000))).alias("chunk")
    )
    assert vec_storage_level(exploded) == StorageLevel.DISK_ONLY


def test_ivf_bounded_stats_contract(spark):
    """stats reports fired sub-levels and hash-split fallback counts
    (r10 — probes use this to confirm which machinery a corpus size
    exercises)."""
    import pandas as pd

    from auto_ts_spark.operators.similarity import ivf_assign_bounded

    rng = np.random.RandomState(3)
    n = 3000
    vecs = rng.randn(n, 8).astype("float32")
    vecs[1000:] = vecs[:2000]  # heavy duplication -> stubborn cells
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": list(map(list, vecs))})
    df = spark.createDataFrame(pdf)
    st: dict = {}
    out = ivf_assign_bounded(df, max_cell_size=64, n_centroids=4, stats=st)
    assert out.count() == n
    assert st["sub_levels"] >= 1  # 4 coarse cells of ~750 rows must split
    assert st["hash_split_cells"] >= 0
    st2: dict = {}
    small = spark.createDataFrame(pdf.head(50))
    ivf_assign_bounded(small, max_cell_size=64, n_centroids=4, stats=st2)
    assert st2 == {"sub_levels": 0, "hash_split_cells": 0}


def test_pair_scoring_norms_precomputed_per_row(spark):
    """r14: the pair-verify stages must evaluate the O(dim) norm
    aggregate once per ROW (pre-join projection / member struct), not
    once per PAIR — value-identical to plain cosine() by construction
    (same IEEE dot/(na*nb) over the same doubles), so this pins the
    PLAN shape: the post-explode scoring projection of
    embedding_near_dup_pairs must contain exactly one array aggregate
    (the dot product), with the norms read from the carried struct
    field."""
    import numpy as np
    import pandas as pd

    from auto_ts_spark.operators.similarity import (
        cosine,
        cosine_with_norms,
        embedding_near_dup_pairs,
        norm,
    )

    rng = np.random.RandomState(7)
    vecs = rng.randn(60, 16).round(3)
    vecs[30:] = vecs[:30] + rng.randn(30, 16) * 0.01  # planted near-dups
    pdf = pd.DataFrame(
        {"vec_id": range(60), "embedding": list(map(list, vecs))}
    )
    df = spark.createDataFrame(pdf)
    out = embedding_near_dup_pairs(df, threshold=0.9)

    # 1. value identity vs the per-pair form on the same planted pairs
    a = F.col("embedding").cast("array<double>")
    ref = (
        df.alias("x")
        .crossJoin(df.alias("y"))
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("id_a"),
            F.col("y.vec_id").alias("id_b"),
            F.round(
                cosine(
                    F.col("x.embedding").cast("array<double>"),
                    F.col("y.embedding").cast("array<double>"),
                ),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.9)
    )
    got = {(r.id_a, r.id_b): r.cosine for r in out.collect()}
    want = {(r.id_a, r.id_b): r.cosine for r in ref.collect()}
    # LSH may miss pairs (recall < 1) but every found pair's score
    # must be bit-identical to the per-pair cosine
    assert got, "no pairs found on planted near-dups"
    for k, v in got.items():
        assert k in want and want[k] == v, (k, v, want.get(k))

    # 2. plan shape: the scoring expressions above the bucket
    # collect_list read the norms from the carried struct fields
    # (a.nrm * b.nrm) and contain NO norm evaluation — norm compiles
    # to aggregate(transform(v, x*x)), so `transform(` in the scoring
    # segment would mean the per-pair recompute came back. (The dot's
    # zip_with may appear more than once up there — Catalyst copies
    # the cosine into the Filter and the Project; runtime
    # subexpression elimination dedups it — but transform( must not
    # appear at all.)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert ".nrm" in plan, plan
    score_segment = plan.split("collect_list")[0]  # above the agg
    assert score_segment.count("transform(") == 0, score_segment
    # and the pre-shuffle signature projection is where the single
    # norm evaluation lives
    below = plan.split("collect_list", 1)[1]
    assert below.count("transform(") >= 1, below
