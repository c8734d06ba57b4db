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


# --------------------------------------------------- chunking (r12)


def test_chunk_documents_window_arithmetic(spark):
    """Pin the window rule against hand-computed chunks: chunk k =
    tokens [k*stride+1, k*stride+chunk] (1-based), n_chunks =
    1 + ceil(max(0, n - chunk)/stride), tail always covered."""
    from auto_ts_spark.operators.textops import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame(
        [
            (1, words),  # n=10, chunk 4 stride 3 -> 1+ceil(6/3)=3 chunks
            (2, "a b c"),  # n=3 < chunk -> single full-doc chunk
            (3, "a b c d"),  # n == chunk -> exactly one chunk
            (4, "  !!  "),  # zero normalized tokens -> dropped
            (5, "a b c d e f g"),  # n=7 -> 1+ceil(3/3)=2 chunks
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=4, stride=3).orderBy(
        "doc_id", "chunk_id"
    )
    rows = [(r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text) for r in out.collect()]
    assert rows == [
        (1, 0, 4, "w0 w1 w2 w3"),
        (1, 1, 4, "w3 w4 w5 w6"),
        (1, 2, 4, "w6 w7 w8 w9"),
        (2, 0, 3, "a b c"),
        (3, 0, 4, "a b c d"),
        (5, 0, 4, "a b c d"),
        (5, 1, 4, "d e f g"),
    ]


def test_chunk_documents_tail_reached_and_overlap_bound(spark):
    """Property over random lengths: every token index is covered,
    the final chunk ends at n, and consecutive chunks overlap by
    exactly chunk - stride except possibly the last pair."""
    from auto_ts_spark.operators.textops import chunk_documents

    docs = [(i, " ".join(f"t{j}" for j in range(i))) for i in range(1, 120)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=16, stride=10)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.n_tokens, r.chunk_text))
    for n, chunks in ((d, sorted(v)) for d, v in by_doc.items()):
        assert chunks[0][0] == 0 and [c[0] for c in chunks] == list(
            range(len(chunks))
        )
        last_k, last_n, last_text = chunks[-1]
        assert last_text.split()[-1] == f"t{n-1}"  # tail covered
        assert last_k * 10 + last_n == n  # final window ends at n
        for k, ntok, _ in chunks[:-1]:
            assert ntok == 16  # only the final chunk may be short


def test_chunk_documents_rejects_bad_stride(spark):
    import pytest as _pytest

    from auto_ts_spark.operators.textops import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_tokens=4, stride=5)
    with _pytest.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_tokens=4, stride=0)


def test_chunk_documents_plan_has_no_shuffle(spark):
    """Plan pin: chunking is one projection + explode — an Exchange
    here would mean the 100 TB corpus gets shuffled just to window it."""
    from auto_ts_spark.operators.textops import chunk_documents

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = (
        chunk_documents(df, chunk_tokens=4, stride=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
