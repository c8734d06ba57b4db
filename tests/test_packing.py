"""Sequence packing (GPT-style concat-and-chunk manifest)."""

import collections

import pytest
from pyspark.sql import functions as F

from auto_ts_spark.operators.packing import pack_sequences


def _manifest(spark, counts, seq_len, **kw):
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(counts)], "doc_id long, n_tok long"
    )
    return pack_sequences(df, seq_len, token_col="n_tok", **kw).collect()


def test_sequences_fill_gaplessly(spark):
    rows = _manifest(spark, [5, 3, 9, 0, 4], 8)
    per_seq = collections.defaultdict(list)
    for r in rows:
        per_seq[r.seq_id].append(r)
    totals = {s: sum(r.n_toks for r in rs) for s, rs in per_seq.items()}
    # 21 tokens -> sequences of 8, 8, 5 (last partial emitted)
    assert totals == {0: 8, 1: 8, 2: 5}
    # within each sequence, spans are gapless from offset 0
    for rs in per_seq.values():
        rs = sorted(rs, key=lambda r: r.seq_tok_start)
        pos = 0
        for r in rs:
            assert r.seq_tok_start == pos
            pos += r.n_toks


def test_documents_fully_covered_and_split(spark):
    rows = _manifest(spark, [5, 3, 9, 0, 4], 8)
    per_doc = collections.defaultdict(list)
    for r in rows:
        per_doc[r.doc_id].append(r)
    # doc 2 (9 tokens) crosses the boundary: two manifest rows
    assert len(per_doc[2]) == 2
    # zero-token doc 3 emits nothing
    assert 3 not in per_doc
    # every doc's spans tile [0, n_toks) exactly
    for doc, n in [(0, 5), (1, 3), (2, 9), (4, 4)]:
        spans = sorted((r.doc_tok_start, r.doc_tok_end) for r in per_doc[doc])
        assert spans[0][0] == 0 and spans[-1][1] == n
        for (_, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 == s2


def test_null_tokens_count_zero(spark):
    df = spark.createDataFrame(
        [(0, 4), (1, None), (2, 4)], "doc_id long, n_tok long"
    )
    rows = pack_sequences(df, 8, token_col="n_tok").collect()
    assert sorted(r.doc_id for r in rows) == [0, 2]
    assert sum(r.n_toks for r in rows) == 8


def test_order_override_changes_packing(spark):
    df = spark.createDataFrame(
        [(0, 6, 1.0), (1, 6, 9.0)], "doc_id long, n_tok long, prio double"
    )
    default = pack_sequences(df, 6, token_col="n_tok").collect()
    by_prio = pack_sequences(
        df, 6, token_col="n_tok", order=[F.col("prio").desc()]
    ).collect()
    assert {r.doc_id: r.seq_id for r in default} == {0: 0, 1: 1}
    assert {r.doc_id: r.seq_id for r in by_prio} == {1: 0, 0: 1}


def test_invalid_seq_len(spark):
    df = spark.createDataFrame([(0, 1)], "doc_id long, n_tok long")
    with pytest.raises(ValueError):
        pack_sequences(df, 0, token_col="n_tok")


def test_no_unpartitioned_window(spark):
    df = spark.createDataFrame(
        [(i, 10) for i in range(100)], "doc_id long, n_tok long"
    )
    plan = (
        pack_sequences(df, 64, token_col="n_tok")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # global offsets come from the two-pass cumsum, never a global sort
    for line in plan.splitlines():
        if "Window" in line:
            assert "_pid" in line, line


def test_negative_tokens_clamp_to_zero(spark):
    # a buggy upstream count must not flow into the global cumsum and
    # shift every later document's offsets
    df = spark.createDataFrame(
        [(0, 4), (1, -5), (2, 4)], "doc_id long, n_tok long"
    )
    rows = pack_sequences(df, 8, token_col="n_tok").collect()
    assert sorted(r.doc_id for r in rows) == [0, 2]
    per_seq = collections.defaultdict(int)
    for r in rows:
        per_seq[r.seq_id] += r.n_toks
    assert per_seq == {0: 8}  # 4 + 4 fills one sequence exactly


def test_tied_order_keys_raise(spark):
    """An upsampled corpus packed without a tiebreak (copies share the
    doc_id) must fail LOUD: tied order keys make span assignment
    nondeterministic."""
    df = spark.createDataFrame(
        [(1, 5), (1, 3), (2, 4)], "doc_id long, n_tok long"
    )
    with pytest.raises(Exception, match="duplicate order keys"):
        pack_sequences(df, 8, token_col="n_tok").collect()
    # the documented escape hatches both work: a tiebreak column...
    df2 = df.withColumn("copy", F.monotonically_increasing_id())
    rows = pack_sequences(
        df2, 8, token_col="n_tok",
        order=[F.col("doc_id").asc(), F.col("copy").asc()],
    ).collect()
    assert sum(r.n_toks for r in rows) == 12
    # ...and the explicit opt-out
    rows2 = pack_sequences(
        df, 8, token_col="n_tok", assert_unique_order=False
    ).collect()
    assert sum(r.n_toks for r in rows2) == 12
