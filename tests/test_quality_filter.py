"""Composite Gopher-rule quality gate (operators/textops.py::
quality_filter): each rule triggers on a planted document, reasons
are sorted and auditable, NULL text fails explicitly."""

import pandas as pd
from pyspark.sql import functions as F

from auto_ts_spark.operators.textops import quality_filter

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs for the hills "
    "while it keeps a steady pace in the warm morning light of a clear day "
) * 2  # ~56 tokens, healthy stopword/punct/digit mix

DOCS = [
    (0, GOOD),
    (1, "too few tokens in this one"),  # n_tokens < 50
    (2, "ha " * 60),  # mean_word_len 2.0 < 3.0; no stopwords either
    (3, ("supercalifragilistic " * 60).strip()),  # mean word len > 10, no stopwords
    (4, GOOD + " " + "!?;:,.!?;:,. " * 30),  # punct_ratio >> 0.20
    (5, GOOD + " " + "1234567890 " * 40),  # digit-heavy
    (6, None),
]


def test_rules_and_reasons(spark):
    df = spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["doc_id", "text"]).astype({"doc_id": "int64"})
    )
    out = (
        quality_filter(df)
        .select("doc_id", "keep", "fail_reasons")
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert bool(out.loc[0, "keep"]) is True and list(out.loc[0, "fail_reasons"]) == []
    assert "n_tokens" in list(out.loc[1, "fail_reasons"])
    assert "mean_word_len" in list(out.loc[2, "fail_reasons"])
    r3 = list(out.loc[3, "fail_reasons"])
    assert "mean_word_len" in r3 and "stopword_ratio" in r3
    assert r3 == sorted(r3)  # reasons are sorted for determinism
    assert "punct_ratio" in list(out.loc[4, "fail_reasons"])
    assert "digit_ratio" in list(out.loc[5, "fail_reasons"])
    assert list(out.loc[6, "fail_reasons"]) == ["null_text"]
    assert not bool(out.loc[6, "keep"])
    # every failing doc is dropped by a keep filter
    kept = quality_filter(df).filter(F.col("keep")).select("doc_id").collect()
    assert sorted(r.doc_id for r in kept) == [0]


def test_custom_rules_override(spark):
    df = spark.createDataFrame(
        pd.DataFrame(DOCS[:2], columns=["doc_id", "text"]).astype({"doc_id": "int64"})
    )
    out = quality_filter(df, rules=(("n_tokens", 1, None),)).toPandas()
    assert out["keep"].all()
