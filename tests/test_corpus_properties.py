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


@settings(max_examples=8, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=30),
    budget=st.integers(min_value=0, max_value=400),
)
def test_budget_greedy_prefix_property(spark, toks, budget):
    """budget_select's per-key and global paths must agree with the
    greedy-prefix reference computed in plain Python, for arbitrary
    token counts and budgets."""
    from auto_ts_spark.operators.budget import budget_select

    df = spark.createDataFrame(
        [(i, "k", int(t)) for i, t in enumerate(toks)],
        "doc_id long, source string, n_tok long",
    )
    # reference: ids ascending, keep while cumsum <= budget
    want, acc = [], 0
    for i, t in enumerate(toks):
        acc += t
        if acc <= budget:
            want.append(i)
        else:
            break
    for by in ("source", None):
        got = sorted(
            r.doc_id
            for r in budget_select(df, budget, by=by, token_col="n_tok").collect()
        )
        assert got == want, (by, toks, budget, got, want)


@settings(max_examples=8, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=0, max_value=25), min_size=1, max_size=25),
    seq_len=st.integers(min_value=1, max_value=17),
)
def test_packing_invariants_property(spark, toks, seq_len):
    """For arbitrary token counts and sequence lengths: every document
    is tiled exactly once across its manifest rows, every sequence
    except the last is exactly full, and in-sequence offsets are
    gapless — the invariants a training reader depends on."""
    from auto_ts_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, int(t)) for i, t in enumerate(toks)], "doc_id long, n_tok long"
    )
    rows = pack_sequences(df, seq_len, token_col="n_tok").collect()
    total = sum(t for t in toks)
    assert sum(r.n_toks for r in rows) == total
    per_doc = {}
    per_seq = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append((r.doc_tok_start, r.doc_tok_end))
        per_seq.setdefault(r.seq_id, []).append((r.seq_tok_start, r.n_toks))
    for i, t in enumerate(toks):
        spans = sorted(per_doc.get(i, []))
        if t == 0:
            assert spans == []
            continue
        assert spans[0][0] == 0 and spans[-1][1] == t
        assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))
    if total:
        last = max(per_seq)
        for sid, spans in per_seq.items():
            spans = sorted(spans)
            assert spans[0][0] == 0
            pos = 0
            for start, n in spans:
                assert start == pos
                pos += n
            if sid != last:
                assert pos == seq_len
