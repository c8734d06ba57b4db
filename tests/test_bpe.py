"""BPE tokenizer tests: the incremental-update training loop is
checked against a naive recompute-from-scratch reference, encoding is
checked against ordered merge replay, and the Spark surface is checked
for the detokenization-lossless invariant and histogram/driver
agreement."""

import random

import pytest
from pyspark.sql import functions as F

from auto_ts_spark.functions import text as TX
from auto_ts_spark.operators.bpe import (
    END,
    _driver_bpe,
    _encode_word,
    _merge_word,
    bpe_pair_counts,
    bpe_tokenize,
    train_bpe,
    word_histogram,
)


def _ref_bpe(words, n_merges, min_pair_count=2):
    """Naive reference: recompute all pair counts from scratch every
    step — O(V · merges), obviously correct."""
    from collections import Counter

    syms = {i: list(w) + [END] for i, (w, _c) in enumerate(words)}
    cnts = {i: c for i, (_w, c) in enumerate(words)}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for i, s in syms.items():
            for p in zip(s, s[1:]):
                pc[p] += cnts[i]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        a, b = best[0]
        merges.append((a, b))
        for i in syms:
            syms[i] = _merge_word(syms[i], a, b, a + b)
    return merges


def test_incremental_training_equals_naive_reference():
    random.seed(42)
    vocab = [
        "hello", "help", "hell", "low", "lower", "lowest",
        "new", "newer", "newest", "wide", "wider", "widest",
        "aaa", "aaaa", "aaaaa", "ab", "abab", "ababab",
        "x", "xy", "xyz",
    ]
    words = [(w, random.randint(1, 50)) for w in vocab]
    for nm in (1, 2, 5, 20, 60):
        assert _driver_bpe(words, nm, 2) == _ref_bpe(words, nm, 2), nm


def test_training_is_deterministic_under_count_ties():
    # every word count 1 → many ties; tie-break is lexicographic pair
    words = [(w, 1) for w in ["ab", "cd", "ef", "abcd"]]
    m1 = _driver_bpe(words, 4, 1)
    m2 = _driver_bpe(list(reversed(words)), 4, 1)
    assert m1 == m2
    assert m1[0] == ("a", "b")  # smallest pair among equal counts


def test_merge_word_left_to_right_nonoverlapping():
    assert _merge_word(list("aaa"), "a", "a", "aa") == ["aa", "a"]
    assert _merge_word(list("aaaa"), "a", "a", "aa") == ["aa", "aa"]
    assert _merge_word(["x", "a", "b", "a", "b"], "a", "b", "ab") == ["x", "ab", "ab"]


def test_encode_equals_ordered_merge_replay():
    random.seed(7)
    words = [(w, random.randint(1, 9)) for w in
             ["banana", "bandana", "ananas", "nan", "ban"]]
    merges = _driver_bpe(words, 20, 1)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["banana", "bandana", "nab", "unseen", "b", "banan"]:
        enc = _encode_word(w, ranks)
        replay = list(w) + [END]
        for a, b in merges:
            replay = _merge_word(replay, a, b, a + b)
        assert enc == replay, w
        assert "".join(enc).replace(END, "") == w  # lossless


def test_spark_training_and_tokenize_invariants(spark, sf_dir):
    from auto_ts_spark.io.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    merges, stats = train_bpe(docs, n_merges=25)
    assert stats["n_merges"] == 25
    assert stats["coverage"] == 1.0  # tiny vocab — nothing capped
    assert stats["n_words_kept"] == stats["n_words_total"]

    # first merge == argmax of the JVM-side pair counts
    top = (
        bpe_pair_counts(docs)
        .orderBy(F.desc("pair_count"), "left", "right")
        .first()
    )
    assert (top["left"], top["right"]) == merges[0]

    tok = bpe_tokenize(docs, merges)
    # 1) detokenization is lossless on every document
    mism = (
        tok.select(
            F.array_join(
                F.transform(
                    "bpe_tokens", lambda t: F.replace(t, F.lit(END), F.lit(" "))
                ),
                "",
            ).alias("rt"),
            F.concat(
                F.array_join(
                    F.filter(TX.tokens(F.col("text")), lambda t: t != ""), " "
                ),
                F.lit(" "),
            ).alias("orig"),
        )
        .filter(F.col("rt") != F.col("orig"))
        .count()
    )
    assert mism == 0
    # 2) merges strictly compress vs the char-level baseline
    sums = tok.select(
        F.sum("n_bpe_real").alias("bpe"),
        F.sum(
            F.aggregate(
                F.filter(TX.tokens(F.col("text")), lambda t: t != ""),
                F.lit(0),
                lambda acc, t: acc + F.length(t) + 1,
            )
        ).alias("chars"),
    ).collect()[0]
    assert sums["bpe"] < sums["chars"]


def test_spark_driver_histogram_agreement(spark, sf_dir):
    """train_bpe trained on Spark's histogram must equal _driver_bpe
    trained on the same histogram collected manually — pins the
    orderBy/limit/collect plumbing."""
    from auto_ts_spark.io.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    hist = [
        (r["word"], int(r["cnt"]))
        for r in word_histogram(docs).orderBy(F.desc("cnt"), "word").collect()
    ]
    merges, _ = train_bpe(docs, n_merges=12)
    assert merges == _driver_bpe(hist, 12, 2)


def test_max_words_cap_and_coverage(spark):
    df = spark.createDataFrame(
        [("aaa bbb aaa ccc aaa bbb",)] * 10 + [("zzz qqq",)], ["text"]
    )
    merges, stats = train_bpe(df, n_merges=5, max_words=2)
    assert stats["n_words_kept"] == 2 and stats["n_words_total"] == 5
    # kept: aaa (30), bbb (20) of mass 30+20+10+10+10... compute:
    # aaa 30, bbb 20, ccc 10, zzz 1, qqq 1 → kept 50 / 62
    assert stats["mass_kept"] == 50 and stats["mass_total"] == 62
    assert abs(stats["coverage"] - 50 / 62) < 1e-12
    # trained only on the kept slice
    assert merges == _driver_bpe([("aaa", 30), ("bbb", 20)], 5, 2)


def test_empty_and_degenerate_inputs(spark):
    df = spark.createDataFrame([("",), ("   ",)], ["text"])
    merges, stats = train_bpe(df, n_merges=5)
    assert merges == [] and stats["mass_total"] == 0
    tok = bpe_tokenize(df, merges).collect()
    assert all(r["n_bpe_real"] == 0 for r in tok)
