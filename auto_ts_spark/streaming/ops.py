"""Structured Streaming variants of the window/aggregation core.

The reference is batch-only (SURVEY.md §2.3 W19 — absent); these are
the scale-extension operators: the same tumbling/sliding/session
aggregations and rolling-forecast semantics, expressed as incremental
streaming plans so a 100 TB/day event feed can be processed as it
arrives instead of re-scanned.

Design:
- event time + watermark everywhere — late rows beyond the watermark
  are dropped deterministically, in-watermark stragglers update their
  window (correctness under out-of-order delivery).
- every aggregation is expressed so the *same function* works under
  batch and streaming (the tests assert batch ≡ streaming on the same
  fixture): tumbling/sliding via ``F.window``, sessions via
  ``F.session_window``.
- custom stateful logic (per-series rolling forecast — the streaming
  form of the reference's recursive one-step forecast,
  auto_ts/models/build_ml.py:595-670) uses ``applyInPandasWithState``
  with an explicit GroupState schema; watermarked dedup state expires
  automatically, keeping state bounded.

Scale notes: streaming aggregation state lives in the state store
partitioned by grouping key — the shuffle is identical to the batch
groupBy; watermarks bound state size; ``availableNow`` triggers give
incremental backfill over historical parquet with the same code.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events directory (parquet).

    The file source is the replayable-backfill path; swapping in a
    Kafka source changes only this function — every downstream operator
    is source-agnostic.
    """
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def ts_field_is_nanos(path: str, field: str = "ts") -> bool:
    """True when the parquet source at ``path`` stores ``field`` as
    TIMESTAMP(NANOS). pq.read_schema rejects directories, so a
    directory source is probed through its first parquet file found
    RECURSIVELY — partitioned datasets keep their files under
    key=val/ subdirectories with no top-level *.parquet. Any file's
    schema is representative: a mixed-unit directory wouldn't stream
    as one source anyway. Unreadable/absent sources probe False (the
    native-timestamp path)."""
    import glob
    import os

    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        probe = path
        if os.path.isdir(path):
            inside = sorted(
                glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
            )
            if not inside:
                return False
            probe = inside[0]
        f = pq.read_schema(probe).field(field)
        return bool(pa.types.is_timestamp(f.type) and f.type.unit == "ns")
    except Exception:
        return False


def read_event_stream_nanos(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over the driver's event parquet, tolerant of
    the ts column's physical type. TIMESTAMP(NANOS) (which Spark can't
    read as a timestamp) is read as the raw nano count and converted
    with the same integer-div truncation as the batch reader
    (io/sources.py::read_parquet); micro/millisecond timestamps are
    read natively — either way stream and batch agree to the
    microsecond."""
    import os
    import tempfile

    ts_is_nanos = ts_field_is_nanos(path)
    if os.path.isfile(path):
        # the file stream source only accepts directories; a symlink
        # inside a temp dir exposes a lone parquet file as one
        d = tempfile.mkdtemp(prefix="stream_src_")
        os.symlink(os.path.abspath(path), os.path.join(d, os.path.basename(path)))
        path = d
    ts_field = StructField("ts", LongType() if ts_is_nanos else TimestampType())
    schema = StructType(
        [
            StructField("event_id", LongType()),
            ts_field,
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    if ts_is_nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return (
            spark.readStream.schema(schema)
            .parquet(path)
            .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        )
    return spark.readStream.schema(schema).parquet(path)


def tumbling_agg(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys: Iterable[str] = ("event_type",),
    exact: bool = False,
) -> DataFrame:
    """Tumbling-window count/sum/avg per key with late-data watermark.

    Streaming form of the batch hourly rollup (date_trunc groupBy):
    identical grouping shuffle, incremental state per (window, key).

    ``exact=True`` accumulates the sum as decimal(28,6): decimal
    addition is associative, so the result is bit-identical no matter
    how the stream is micro-batched — the mode the cross-engine oracle
    check runs in (float sums would drift with accumulation order).
    The exact average is emitted in integer MICRO-units (sum*1e6 `div`
    n): a rounded double quotient can land exactly on a round-half
    boundary where engines disagree by one final digit (seen once at
    sf0.1), while integer division is engine-independent. This is true
    bigint ``div`` (floored quotient of exact integers), NOT
    ``floor(a / b)`` — `/` on bigints is IEEE double division, which
    stops being exact past 2^53 micro-units.
    """
    if exact:
        dec = F.sum(F.col("value").cast("decimal(28,6)"))
        aggs = [
            F.count(F.lit(1)).alias("n_events"),
            F.round(dec.cast("double"), 6).alias("sum_value"),
            F.expr(
                "CAST(sum(CAST(value AS decimal(28,6))) * 1000000 AS bigint)"
                " div count(1)"
            ).alias("avg_value_micros"),
        ]
    else:
        aggs = [
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        ]
    avg_col = "avg_value_micros" if exact else "avg_value"
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), *keys)
        .agg(*aggs)
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *keys,
            "n_events",
            "sum_value",
            avg_col,
        )
    )


def sliding_agg(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    keys: Iterable[str] = ("event_type",),
    exact: bool = False,
) -> DataFrame:
    """Sliding-window aggregation (streaming rolling stats, W5).

    ``exact=True`` swaps the float avg/std pair for decimal-sum
    n/sum/avg (associative → micro-batch-order independent), the mode
    the cross-engine value check runs in."""
    if exact:
        # decimal sum + integer-micros `div` average: see tumbling_agg
        # — a rounded double quotient can tie at the round-half
        # boundary where engines disagree, and floor(a/b) on bigints
        # is double division (inexact past 2^53)
        dec = F.sum(F.col("value").cast("decimal(28,6)"))
        aggs = [
            F.count(F.lit(1)).alias("n_events"),
            F.round(dec.cast("double"), 6).alias("sum_value"),
            F.expr(
                "CAST(sum(CAST(value AS decimal(28,6))) * 1000000 AS bigint)"
                " div count(1)"
            ).alias("avg_value_micros"),
        ]
        out_cols = ["n_events", "sum_value", "avg_value_micros"]
    else:
        aggs = [
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.stddev_samp("value"), 6).alias("std_value"),
        ]
        out_cols = ["n_events", "avg_value", "std_value"]
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), *keys)
        .agg(*aggs)
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *keys,
            *out_cols,
        )
    )


def session_agg(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key: str = "user_id",
    exact: bool = False,
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity (streaming form of the batch sessionize operator —
    merging variable-length windows the state store handles natively).

    ``exact=True`` routes the sum through decimal(28,6) (associative →
    micro-batch-order independent), the mode the cross-engine value
    check runs in.
    """
    if exact:
        sum_col = F.round(
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double"), 6
        ).alias("sum_value")
    else:
        sum_col = F.round(F.sum("value"), 6).alias("sum_value")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_col,
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key,
            "n_events",
            "sum_value",
        )
    )


_FORECAST_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("ewma", DoubleType()),
    ]
)

_FORECAST_OUT = StructType(
    [
        StructField("series_id", StringType()),
        StructField("batch_n", LongType()),
        StructField("running_n", LongType()),
        StructField("running_mean", DoubleType()),
        StructField("ewma", DoubleType()),
        StructField("yhat_next", DoubleType()),
    ]
)


def stateful_rolling_forecast(
    events: DataFrame,
    *,
    alpha: float = 0.3,
    watermark: str = "2 hours",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-series incremental forecast state (applyInPandasWithState).

    The streaming analogue of the reference's recursive one-step-ahead
    forecast loop (auto_ts/models/build_ml.py:595-670): instead of
    re-lagging the whole frame per step, each micro-batch folds its
    rows into O(1) state (count, running mean, EWMA) and emits the
    one-step-ahead prediction ``yhat_next``. State is per-key in the
    state store — millions of series scale horizontally. NoTimeout here
    because the drain pattern is bounded backfill (availableNow), where
    a processing-time timeout would keep scheduling batches forever; a
    continuously-deployed variant should add EventTimeTimeout to expire
    abandoned series.
    """

    def update(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True)
        # shuffle delivery order within a micro-batch is arbitrary — the
        # EWMA fold is order-sensitive, so impose event-time order
        rows = rows.sort_values(["ts", "event_id"])
        vals = rows[value_col].astype(float)
        if state.exists:
            n, mean, ewma = state.get
        else:
            n, mean, ewma = 0, 0.0, None
        for v in vals:
            n += 1
            mean += (v - mean) / n
            ewma = v if ewma is None else alpha * v + (1 - alpha) * ewma
        state.update((n, float(mean), float(ewma)))
        yield pd.DataFrame(
            {
                "series_id": [str(key[0])],
                "batch_n": [len(vals)],
                "running_n": [n],
                "running_mean": [round(float(mean), 6)],
                "ewma": [round(float(ewma), 6)],
                "yhat_next": [round(float(ewma), 6)],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=_FORECAST_OUT,
            stateStructType=_FORECAST_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_completion(
    stream_df: DataFrame, *, sink_table: str, checkpoint_dir: str
) -> None:
    """Drain a bounded stream (availableNow) into a memory sink —
    the incremental-backfill pattern: process all existing files in
    micro-batches, then stop."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("complete" if _is_aggregation(stream_df) else "append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _is_aggregation(df: DataFrame) -> bool:
    return "Aggregate" in df._jdf.queryExecution().analyzed().toString()


def dedup_stream(
    df: DataFrame,
    *,
    key_cols: Iterable[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival per key, dropping
    re-deliveries within the watermark horizon (state per key expires
    with the watermark, so memory is bounded by arrival rate x
    watermark, not stream length). The streaming form of the batch
    ``dedup_exact`` — at-least-once sources become effectively-once."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters (r10): term-sharded Misra-Gries state.
# ---------------------------------------------------------------------------

_HH_STATE = (
    "terms array<string>, counts array<long>, defl long, seq long"
)
_HH_OUT = StructType(
    [
        StructField("shard", LongType()),
        StructField("seq", LongType()),
        StructField("term", StringType()),
        StructField("est", LongType()),
        StructField("defl", LongType()),
    ]
)


def streaming_heavy_hitters(
    docs: DataFrame,
    *,
    text_col: str = "text",
    capacity: int = 4096,
    n_shards: int = 8,
    ngram: int = 1,
) -> DataFrame:
    """Streaming top terms with BOUNDED state: the streaming form of
    ``operators.sketches.approx_heavy_hitters``. Terms shard by hash
    (each term always lands in one shard), and each shard folds its
    micro-batches into a Misra-Gries summary of at most ``capacity``
    counters via ``applyInPandasWithState`` — total state is
    capacity x n_shards rows FOREVER, independent of stream length,
    which is the whole point: an exact streaming groupBy-count grows
    state with the term universe. Summaries are mergeable per batch
    (same `_mg_merge` kernel as the batch op), so every emission
    carries the shard's current estimates plus its cumulative
    deflation ``defl`` — the per-shard error certificate
    (est <= true <= est + defl, and defl == 0 means exact so far).
    Each batch emits the full summary tagged with a monotone ``seq``;
    the reader keeps each shard's max-seq rows (the forecast-state
    pattern). n_shards scales the stateful stage horizontally — at
    cluster scale use hundreds."""
    from auto_ts_spark.functions import text as TX
    from auto_ts_spark.operators.sketches import _mg_merge

    terms_col = (
        TX.tokens(F.col(text_col))
        if ngram == 1
        else TX.shingles(F.col(text_col), ngram)
    )
    terms = docs.select(F.explode(terms_col).alias("term")).filter(
        F.col("term") != ""
    )
    sharded = terms.withColumn(
        "shard", F.pmod(F.xxhash64("term"), F.lit(n_shards))
    )

    def update(key, pdfs, state: GroupState):
        batch = pd.concat(list(pdfs), ignore_index=True)
        vc = batch["term"].value_counts()
        if state.exists:
            terms_l, counts_l, defl, seq = state.get
            prev = pd.Series(
                [int(c) for c in counts_l], index=list(terms_l), dtype="int64"
            )
        else:
            prev, defl, seq = None, 0, 0
        merged, d = _mg_merge(prev, vc, capacity)
        defl = int(defl) + int(d)
        seq = int(seq) + 1
        state.update(
            (
                [str(t) for t in merged.index],
                [int(c) for c in merged.values],
                defl,
                seq,
            )
        )
        yield pd.DataFrame(
            {
                "shard": int(key[0]),
                "seq": seq,
                "term": merged.index.astype(str),
                "est": merged.values.astype("int64"),
                "defl": defl,
            }
        )

    return sharded.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=_HH_OUT,
        stateStructType=_HH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
