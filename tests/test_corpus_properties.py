"""Property-style invariants for the corpus-curation operators:
redaction idempotence, decontamination self-consistency, and the
streaming-compatibility of the stateless scrub (the shape a live
ingestion pipeline runs it in)."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from auto_ts_spark.operators.pii import pii_profile, redact_documents
from auto_ts_spark.operators.decontam import contamination_hits

_PII_SNIPPETS = [
    "a@b.io",
    "555-123-4567",
    "(555) 987 6543",
    "123-45-6789",
    "4242 4242 4242 4242",
    "10.0.0.1",
    "plain words",
    "42",
]


@settings(max_examples=8, deadline=None)
@given(
    pieces=st.lists(st.sampled_from(_PII_SNIPPETS), min_size=0, max_size=8),
    sep=st.sampled_from([" ", ", ", " and "]),
)
def test_redaction_is_idempotent(spark, pieces, sep):
    """redact(redact(x)) == redact(x) for any composition of PII and
    non-PII fragments — replacement tokens must never re-match any
    pattern — and redacted text carries no remaining PII."""
    text = sep.join(pieces)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [text]}))
    once = redact_documents(df).toPandas()["text"][0]
    twice = redact_documents(redact_documents(df)).toPandas()["text"][0]
    assert once == twice
    again = pii_profile(redact_documents(df)).toPandas()
    assert int(again["pii_total"][0]) == 0


def test_decontaminate_against_self_flags_every_long_doc(spark):
    """contamination_hits(corpus, corpus): every document of >= n
    words must hit itself (its own grams are in the benchmark set) —
    the degenerate-input sanity bound."""
    rows = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "one two three four"),
        (2, "too short"),  # < n words → whole-text gram, still self-hits
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hits = contamination_hits(df, df, n=4).toPandas().set_index("doc_id")
    assert set(hits.index) == {0, 1, 2}
    assert (hits["n_hits"] >= 1).all()


def test_pii_scrub_works_as_a_stream(spark, tmp_path):
    """The scrub is stateless, so it must run unchanged under
    Structured Streaming: file stream -> redact_documents -> sink
    equals the batch result."""
    from auto_ts_spark.streaming.ops import run_to_completion

    src = tmp_path / "pii_src"
    pdf = pd.DataFrame(
        {
            "doc_id": pd.array([0, 1, 2], dtype="int64"),
            "text": [
                "mail a@b.io now",
                "call 555-123-4567",
                "clean",
            ],
        }
    )
    spark.createDataFrame(pdf).write.parquet(str(src))
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    out = redact_documents(stream)
    run_to_completion(
        out, sink_table="t_pii_stream", checkpoint_dir=str(tmp_path / "ckpt")
    )
    got = spark.table("t_pii_stream").toPandas().set_index("doc_id").sort_index()
    want = (
        redact_documents(spark.read.parquet(str(src)))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(got["text"]) == list(want["text"])
    assert got.loc[0, "text"] == "mail <EMAIL> now"
