"""End-to-end corpus curation chain (auto_ts_spark/corpus.py)."""

from auto_ts_spark.corpus import curate
from auto_ts_spark.io.sources import load_table


def test_curate_full_chain_on_testdata(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter("doc_id % 53 = 0")
    corpus = docs.filter("doc_id % 53 != 0")
    out, counts = curate(
        corpus,
        benchmark=bench,
        mixture={f"src{i}": 1.0 for i in range(10)},
        token_budget=400,
        budget_by="source",
        stage_counts=True,
    )
    # monotone shrinkage through the filter stages (mixture at rate 1.0
    # and the budget can only keep or drop)
    order = [
        "input", "quality", "redact", "dedup_exact", "near_dedup",
        "decontaminate", "mixture", "budget",
    ]
    assert list(counts) == order
    for a, b in zip(order, order[1:]):
        if b == "redact":
            assert counts[b] == counts[a]  # redaction never drops rows
        else:
            assert counts[b] <= counts[a], (a, b, counts)
    assert counts["budget"] > 0
    # schema passes through plus the mixture copy counter, and the
    # result is deterministic
    assert out.columns == corpus.columns + ["copy_n"]
    again = curate(
        corpus,
        benchmark=bench,
        mixture={f"src{i}": 1.0 for i in range(10)},
        token_budget=400,
        budget_by="source",
    )
    assert out.exceptAll(again).count() == 0
    assert again.exceptAll(out).count() == 0


def test_curate_stages_optional(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    out = curate(
        docs,
        quality=False,
        redact=False,
        dedup_exact=False,
        near_dedup=False,
    )
    assert out.count() == 50  # no enabled stage -> identity
