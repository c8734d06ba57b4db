"""Token-budget corpus selection (operators/budget.py)."""

import pandas as pd
from pyspark.sql import functions as F

from auto_ts_spark.operators.budget import budget_select

DOCS = [
    # (doc_id, source, text) — whitespace token counts in comments
    (0, "a", "one two three four five"),        # 5
    (1, "a", "one two three"),                  # 3
    (2, "a", "one two three four five six"),    # 6
    (3, "a", "one"),                            # 1
    (4, "b", "x " * 9 + "x"),                   # 10
    (5, "b", "y"),                              # 1
    (6, "b", None),                             # 0 tokens
]


def _df(spark):
    return spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["doc_id", "source", "text"]).astype(
            {"doc_id": "int64"}
        )
    )


def test_per_key_budget_greedy_prefix(spark):
    """Priority None -> rank by doc_id; the doc that would cross the
    budget is dropped and so is everything ranked after it."""
    kept = budget_select(_df(spark), 9, by="source")
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    # source a by id: 0(5) 1(3) -> cum 8; 2(6) crosses -> dropped, and
    # 3 after it (cum would be 15 under the prefix rule) also dropped
    # source b: 4(10) crosses immediately; 5,6 dropped with it
    assert ids == [0, 1]


def test_priority_column_reorders_selection(spark):
    """Ranking by token-richness first changes WHICH docs fit."""
    df = _df(spark).withColumn(
        "n_tok", F.size(F.split(F.coalesce("text", F.lit("")), " "))
    )
    kept = budget_select(df, 9, by="source", priority_col="n_tok")
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    # source a by n_tok desc: 2(6) cum 6, 0(5) crosses -> stop => {2}
    # source b by n_tok desc: 4(10) crosses -> {}
    assert ids == [2]


def test_global_two_pass_equals_naive(spark):
    """The distributed global cumsum must select exactly the rows a
    driver-side replay of the same greedy rule selects."""
    import numpy as np

    rng = np.random.RandomState(0)
    pdf = pd.DataFrame(
        {
            "doc_id": pd.array(range(300), dtype="int64"),
            "source": ["s"] * 300,
            "text": [" ".join(["w"] * int(k)) for k in rng.randint(1, 30, 300)],
            "prio": rng.randint(0, 1000, 300).astype("int64"),
        }
    )
    df = spark.createDataFrame(pdf).repartition(8)
    budget = 900
    kept = budget_select(df, budget, by=None, priority_col="prio")
    got = sorted(r.doc_id for r in kept.select("doc_id").collect())

    toks = pdf["text"].str.split(" ").str.len()
    order = pdf.assign(t=toks).sort_values(
        ["prio", "doc_id"], ascending=[False, True]
    )
    cum, want = 0, []
    for _, row in order.iterrows():
        cum += row["t"]
        if cum > budget:
            break
        want.append(row["doc_id"])
    assert got == sorted(want)


def test_global_path_has_no_unpartitioned_window(spark):
    """The global budget must NOT fall back to a single-task
    Window.orderBy: its windows all carry a real partition key."""
    df = _df(spark)
    plan = (
        budget_select(df, 9, by=None)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    for m in re.finditer(r"Window \[(.*?)\]", plan):
        assert "windowspecdefinition(" not in m.group(1) or "_pid" in m.group(1)


def test_global_path_fractional_and_null_token_columns(spark):
    """A user token column may be fractional (BPE estimates) or NULL
    in whole range slices — offsets must not truncate and NULL slice
    totals count zero."""
    pdf = pd.DataFrame(
        {
            "doc_id": pd.array(range(40), dtype="int64"),
            "est": [0.5] * 20 + [None] * 20,  # NULLs sort to one end
        }
    )
    df = spark.createDataFrame(pdf).repartition(6)
    kept = budget_select(df, 5, by=None, token_col="est")
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    # by id: docs 0..9 cost 0.5 each -> cum 5.0 at doc 9; doc 10 would
    # be 5.5 (truncated offsets would wrongly keep it)
    assert ids == list(range(10))


def test_user_token_col_null_costs_zero_consistently(spark):
    """A NULL in a user-supplied token column counts 0 — including
    when it ranks FIRST (an unnormalized NULL would make the window
    sum NULL and silently drop the row)."""
    df = spark.createDataFrame(
        [(0, "a", None), (1, "a", 3), (2, "a", 5)],
        "doc_id long, source string, est long",
    )
    kept = budget_select(df, 3, by="source", token_col="est")
    assert sorted(r.doc_id for r in kept.select("doc_id").collect()) == [0, 1]


def test_caller_column_name_collision(spark):
    """A pre-existing _n_tokens (or passing it AS the token column)
    must survive untouched in the output."""
    df = spark.createDataFrame(
        [(0, "a", "one two", 7), (1, "a", "three", 1)],
        "doc_id long, source string, text string, _n_tokens long",
    )
    out = budget_select(df, 3, by="source")  # derived counts: 2 then 1
    assert "_n_tokens" in out.columns
    assert {r["_n_tokens"] for r in out.collect()} == {7, 1}
    # explicit token_col pointing at that name is honored, not dropped
    out2 = budget_select(df, 7, by="source", token_col="_n_tokens")
    assert sorted(r.doc_id for r in out2.select("doc_id").collect()) == [0]
    assert "_n_tokens" in out2.columns


def test_extra_tiebreak_makes_upsampled_copies_deterministic(spark):
    """Upsampled copies share doc_id and priority — without the copy
    counter in the order the budget cut among tied copies would be
    arbitrary. With extra_tiebreak the LOWEST copy numbers survive,
    on both execution paths."""
    from auto_ts_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(
        [(0, "s", "w w w"), (1, "s", "w w w")],  # 3 tokens each
        "doc_id long, source string, text string",
    )
    mixed = mixture_sample(df, {"s": 3.0})  # 3 copies of each doc -> 18 tokens
    for by in ("source", None):
        kept = budget_select(
            mixed, 9, by=by, extra_tiebreak=("copy_n",)
        )  # budget fits exactly 3 of the 6 copies
        got = sorted(
            (r.doc_id, r.copy_n) for r in kept.select("doc_id", "copy_n").collect()
        )
        # id asc then copy asc: doc0 copies 1..3 fill the budget
        assert got == [(0, 1), (0, 2), (0, 3)], (by, got)


def test_null_text_counts_zero_and_survives(spark):
    """NULL text = 0 tokens — it costs nothing, so under an id-ranked
    per-key budget it is kept whenever it is reached."""
    df = spark.createDataFrame(
        [(0, "a", None), (1, "a", "one two")], "doc_id long, source string, text string"
    )
    kept = budget_select(df, 2, by="source")
    assert sorted(r.doc_id for r in kept.select("doc_id").collect()) == [0, 1]


def test_global_path_integer_exact_past_2_53(spark):
    """Cumulative totals beyond 2^53 must stay integer-exact on the
    global path: carried as doubles, consecutive huge totals collapse
    to the same float and the greedy boundary row would be
    mis-included/excluded."""
    big = 2**53  # doubles cannot represent 2**53 + 1
    df = spark.createDataFrame(
        [(i, big + 1) for i in range(4)], "doc_id long, n_tok long"
    )
    # budget admits exactly 2 rows; as doubles 3*(2^53+1) rounds to
    # 3*2^53 + 4 > budget either way, but the 2-vs-3 boundary needs
    # the exact comparison 2*(2^53+1) <= 2*(2^53+1) < 3*(2^53+1)
    kept = budget_select(df, 2 * (big + 1), token_col="n_tok")
    assert sorted(r.doc_id for r in kept.select("doc_id").collect()) == [0, 1]
    # one token less than 2 full rows -> only 1 row fits, exactly
    kept1 = budget_select(df, 2 * (big + 1) - 1, token_col="n_tok")
    assert sorted(r.doc_id for r in kept1.select("doc_id").collect()) == [0]
