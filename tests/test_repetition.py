"""repetition_profile: hand-computed Gopher-style repetition metrics
on planted documents."""

import pandas as pd

from auto_ts_spark.operators.textops import repetition_profile


def test_repetition_planted(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    # 6 tokens: "a" x4, "b c"; top uni 4/6; bigrams:
                    # "a a" x3, "a b", "b c" -> top bi 3/5; trigrams:
                    # "a a a" x2, "a a b", "a b c" -> 1 dup in 4
                    "a a a a b c",
                    # no repetition at all
                    "one two three four",
                    # 2 tokens: no trigrams -> dup_trigram_frac 0
                    "x y",
                ],
            }
        )
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in repetition_profile(docs).collect()
    }
    assert out[0]["n_tokens"] == 6
    assert abs(out[0]["top_unigram_frac"] - round(4 / 6, 6)) < 1e-9
    assert abs(out[0]["top_bigram_frac"] - 0.6) < 1e-9
    assert abs(out[0]["dup_trigram_frac"] - 0.25) < 1e-9
    assert out[1]["top_unigram_frac"] == 0.25
    assert out[1]["dup_trigram_frac"] == 0.0
    assert out[2]["n_tokens"] == 2
    assert out[2]["top_bigram_frac"] == 1.0
    assert out[2]["dup_trigram_frac"] == 0.0


def test_repetition_profile_keeps_null_text_docs(spark):
    """A NULL-text document must appear in the profile with zero
    metrics, not vanish (the n-gram explode drops its rows; the
    output anchors on the full document set)."""
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a a a"), (4, "w x y z")],
        "doc_id long, text string",
    )
    from auto_ts_spark.operators.textops import repetition_profile

    out = repetition_profile(docs).toPandas().set_index("doc_id").sort_index()
    assert list(out.index) == [1, 2, 3, 4]
    assert out.loc[1, "n_tokens"] == 0
    assert out.loc[1, "top_unigram_frac"] == 0.0
    assert abs(out.loc[3, "top_unigram_frac"] - 1.0) < 1e-9


def test_repetition_filter_drops_spam_keeps_prose(spark):
    from auto_ts_spark.operators.textops import repetition_filter

    prose = (
        "the market opened higher while investors weighed new data on "
        "inflation and growth prospects across several regions today"
    )
    spam = "buy now " * 40  # one bigram dominates everything
    df = spark.createDataFrame(
        [(0, prose), (1, spam)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in repetition_filter(df).collect()}
    assert rows[0]["keep"] is True and rows[0]["fail_reasons"] == []
    assert rows[1]["keep"] is False
    assert "top_bigram_frac" in rows[1]["fail_reasons"]


def test_repetition_stage_in_curate(spark):
    from auto_ts_spark.corpus import curate

    good = (
        "many different words appear in this lengthy and varied sentence "
        "because natural prose rarely repeats the same token runs often"
    )
    spam = "win money fast " * 30
    df = spark.createDataFrame(
        [(i, "src0", good + f" tail {i}") for i in range(3)]
        + [(9, "src0", spam)],
        "doc_id long, source string, text string",
    )
    out, counts = curate(
        df,
        quality=False,  # isolate the repetition stage
        repetition=True,
        redact=False,
        dedup_exact=False,
        near_dedup=False,
        stage_counts=True,
    )
    assert counts["repetition"] == 3
    assert sorted(r.doc_id for r in out.collect()) == [0, 1, 2]


def test_repetition_filter_null_text_fails(spark):
    from auto_ts_spark.operators.textops import repetition_filter

    df = spark.createDataFrame(
        [(0, None), (1, "plenty of distinct words in ordinary readable prose here")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_filter(df).collect()}
    assert rows[0]["keep"] is False
    assert list(rows[0]["fail_reasons"]) == ["null_text"]
    assert rows[1]["keep"] is True
