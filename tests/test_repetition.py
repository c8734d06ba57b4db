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
