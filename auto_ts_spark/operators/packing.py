"""Sequence packing — turn a curated corpus into fixed-length training
sequences (the GPT-style "concatenate everything, then chunk" step
every LLM pre-training pipeline runs after curation).

The operator emits a packing MANIFEST, not token arrays: each output
row says "tokens [doc_tok_start, doc_tok_end) of document X land in
sequence S starting at in-sequence offset seq_tok_start". The training
reader materializes tokens from the manifest; the 100 TB corpus is
never re-written. Documents crossing a sequence boundary simply emit
one manifest row per sequence they touch.

Spark-first shape: a deterministic global order (id ascending by
default) + the two-pass distributed prefix sum from
``operators.budget`` assign every document its global token offset
with no single-task sort; chunk spans are a pure projection + a
bounded ``sequence``-explode. One range shuffle total."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from auto_ts_spark.functions import text as TX
from auto_ts_spark.operators.budget import _ordered_cumsum_global


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    *,
    token_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    order: list[Column] | None = None,
    assert_unique_order: bool = True,
) -> DataFrame:
    """Packing manifest: ``(seq_id, doc_id, doc_tok_start, doc_tok_end,
    seq_tok_start, n_toks)`` — one row per (document × sequence it
    touches), sequences filled gaplessly in the global document order.

    ``token_col`` supplies pre-computed token counts; otherwise they
    derive from ``text_col`` with the engine tokenizer. Zero/NULL-token
    documents occupy no span and emit no rows. ``order`` overrides the
    global packing order (default: ``id_col`` ascending — content-
    addressed and deterministic; pass a priority column to pack
    curriculum-style). The final partial sequence is emitted too —
    drop ``seq_id = max`` if training requires only full sequences.

    Determinism requires UNIQUE order keys: over an upsampled corpus
    (mixture copies share the id) add the copy counter to ``order`` as
    a tiebreak, exactly like ``budget_select``'s ``extra_tiebreak`` —
    rows tied on every order key get an arbitrary relative offset.
    ``assert_unique_order=True`` (the default) makes that misuse LOUD:
    any tie on the full order key raises at execution time instead of
    silently shuffling spans between runs. The check rides the cumsum
    pass's existing per-slice sort (ties co-locate under the range
    partitioner), costing no extra shuffle; pass ``False`` only when
    the keys are unique by construction and the two extra window
    functions matter.
    """
    seq_len = int(seq_len)
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    work = df
    tok = "_n_toks"
    while tok in df.columns:
        tok += "_"
    if token_col is None:
        work = work.withColumn(
            tok, TX.token_count(F.col(text_col)).cast("long")
        )
    else:
        work = work.withColumn(tok, F.col(token_col).cast("long"))
    # NULL and negative counts both clamp to 0: a negative count from
    # a buggy upstream column would otherwise flow INTO the global
    # cumsum and silently shift every later document's offsets
    # (overlapping spans), while the row itself gets filtered below
    work = work.withColumn(
        tok, F.greatest(F.coalesce(F.col(tok), F.lit(0)), F.lit(0))
    )
    order = order or [F.col(id_col).asc()]
    cum = "_cum_toks"
    while cum in df.columns:
        cum += "_"
    work = _ordered_cumsum_global(
        work,
        tok,
        order,
        cum,
        assert_unique_order=assert_unique_order,
        assert_msg=(
            "pack_sequences: duplicate order keys — packing offsets would "
            "be nondeterministic; add a tiebreak column (e.g. the mixture "
            "copy counter) to `order` or pass assert_unique_order=False"
        ),
    )
    start = (F.col(cum) - F.col(tok)).alias("_start")
    work = work.filter(F.col(tok) > 0).select(
        F.col(id_col), F.col(tok), start, F.col(cum).alias("_end")
    )
    # true bigint `div`, not floor(a / b): `/` on bigints is IEEE
    # double division, exact only below 2^53 cumulative tokens —
    # integer division keeps the manifest exact at any corpus size
    # (offsets are non-negative, so div == floor here)
    first_seq = F.expr(f"_start div {seq_len}")
    last_seq = F.expr(f"(_end - 1) div {seq_len}")
    exploded = work.select(
        "*", F.explode(F.sequence(first_seq, last_seq)).alias("seq_id")
    )
    # intersection of [_start, _end) with [seq_id*L, (seq_id+1)*L)
    lo = F.greatest(F.col("_start"), F.col("seq_id") * seq_len)
    hi = F.least(F.col("_end"), (F.col("seq_id") + 1) * seq_len)
    return exploded.select(
        F.col("seq_id").cast("bigint"),
        F.col(id_col),
        (lo - F.col("_start")).cast("bigint").alias("doc_tok_start"),
        (hi - F.col("_start")).cast("bigint").alias("doc_tok_end"),
        (lo - F.col("seq_id") * seq_len).cast("bigint").alias("seq_tok_start"),
        (hi - lo).cast("bigint").alias("n_toks"),
    )
