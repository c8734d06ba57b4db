"""Streaming-family scale probe: the last operator family without a
measured scale record (batch families all have BASELINE rows).

Two production shapes, per scale n:

1. INGESTION (``curate_stream``: inline quality gate -> PII scrub ->
   watermarked fingerprint dedup, append to a parquet sink). The
   source models a FIXED ARRIVAL RATE (10 docs per event-time second,
   ~10% exact re-deliveries, ~1% PII), so growing n grows the event-
   time span, not the rate — the claim under test is the docstring's
   "state bounded by arrival rate x watermark horizon, NOT stream
   length": max dedup-state rows must stay ~flat (≈ rate x 2h = ~72k
   fingerprints) while n grows 4x, and throughput (rows/s of wall)
   must stay ~flat.

2. ROLLUP (``tumbling_agg`` 1h windows x 8 keys, append mode). State
   is open windows x keys — bounded by the watermark horizon, so max
   state rows must stay ~flat as n grows. Append mode only emits
   windows the watermark has closed; the residual open tail staying
   in state at end-of-stream is by design (availableNow backfill).

Both run as real micro-batched streams: ts-ordered source files each
covering a FIXED 0.5 h slice of event time (18k rows), with
maxFilesPerTrigger=4 -> every micro-batch replays ~2 h of arrivals
regardless of n (so batch count grows with n, batch SIZE does not —
the production regime where state bounds are meaningful), availableNow
trigger, parquet sink + checkpoint (the exactly-once landing pattern
from README "Streaming vs batch curation").

Usage: python tools/probe_streaming_scale.py [n_docs ...]
  default: 1000000 4000000
Prints one JSON line per (scale, shape).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCS_PER_EVENT_SECOND = 10  # fixed arrival rate at every scale
ROWS_PER_FILE = 18_000  # 0.5 h of event time per source file
FILES_PER_TRIGGER = 4  # -> each micro-batch spans ~2 h of arrivals

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs for the hills "
    "while it keeps a steady pace in the warm morning light of a clear day "
) * 2


def make_source(spark, n: int, path: str) -> None:
    """n docs, executor-side, written as 64 event-time-ordered parquet
    files. Every 10th doc repeats the text of the group head 0.9 s
    earlier (re-delivery inside any sane watermark); every 100th doc
    carries an email for the PII stage. Event time advances at a fixed
    10 docs/s so state bounds can be read against rate x horizon."""
    from pyspark.sql import functions as F

    df = (
        spark.range(n)
        .withColumn(
            "content_id",
            F.when(F.col("id") % 10 == 9, F.col("id") - 9).otherwise(F.col("id")),
        )
        .select(
            F.col("id").alias("doc_id"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + F.make_interval(secs=F.col("id") / F.lit(DOCS_PER_EVENT_SECOND))
            ).alias("ts"),
            F.concat(
                F.lit(GOOD),
                F.lit(" doc "),
                F.col("content_id").cast("string"),
                F.when(
                    F.col("content_id") % 100 == 0, F.lit(" contact a@b.io now")
                ).otherwise(F.lit("")),
            ).alias("text"),
            F.pmod(F.col("id"), F.lit(8)).cast("int").alias("event_type"),
            (F.pmod(F.col("id"), F.lit(1000)) / F.lit(10.0)).alias("value"),
        )
    )
    # range-partition on ts so file k covers the k-th 0.5 h event-time
    # slice: maxFilesPerTrigger then replays arrival order and the
    # watermark advances monotonically between micro-batches, as in
    # production; file count scales with n, file SIZE does not
    n_files = max(2, -(-n // ROWS_PER_FILE))
    df.repartitionByRange(n_files, "ts").sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(path)
    # the file stream source picks up files in MODIFICATION-TIME order,
    # and the parallel write finishes parts in arbitrary order — stamp
    # mod times in part order (= ts order under repartitionByRange) or
    # micro-batches would interleave event time and the watermark would
    # drop in-order rows as late
    parts = sorted(
        f for f in os.listdir(path) if f.startswith("part-") and f.endswith(".parquet")
    )
    base_mt = int(time.time()) - len(parts) - 10
    for i, f in enumerate(parts):
        os.utime(os.path.join(path, f), (base_mt + i, base_mt + i))


def drain(stream_df, sink_dir: str, ck_dir: str) -> list[dict]:
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", ck_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progs = []
    for p in q.recentProgress:
        progs.append(json.loads(p.json) if hasattr(p, "json") else dict(p))
    return progs


def state_stats(progs: list[dict]) -> dict:
    batches = [p for p in progs if p.get("numInputRows", 0) > 0]
    state_max = 0
    for p in progs:
        for so in p.get("stateOperators", []) or []:
            state_max = max(state_max, so.get("numRowsTotal", 0))
    return {"n_batches": len(batches), "max_state_rows": state_max}


def probe(spark, n: int, shape: str, workdir: str) -> dict:
    from auto_ts_spark.corpus import curate_stream
    from auto_ts_spark.streaming.ops import tumbling_agg

    src = os.path.join(workdir, f"src_{n}")
    if not os.path.exists(src):
        make_source(spark, n, src)
    sink = os.path.join(workdir, f"sink_{shape}_{n}")
    ck = os.path.join(workdir, f"ck_{shape}_{n}")
    for d in (sink, ck):
        shutil.rmtree(d, ignore_errors=True)

    reader = (
        spark.readStream.schema(
            "doc_id long, ts timestamp, text string, event_type int, value double"
        )
        .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
        .parquet(src)
    )
    if shape == "curate":
        out = curate_stream(reader.select("doc_id", "ts", "text"), ts_col="ts")
    else:
        out = tumbling_agg(
            reader.select("ts", "event_type", "value"),
            window="1 hour",
            watermark="2 hours",
            keys=("event_type",),
        )
    t0 = time.perf_counter()
    progs = drain(out, sink, ck)
    wall = time.perf_counter() - t0
    out_rows = spark.read.parquet(sink).count() if os.listdir(sink) else 0
    st = state_stats(progs)
    return {
        "shape": shape,
        "n_docs": n,
        "wall_s": round(wall, 1),
        "rows_per_s": int(n / wall),
        "out_rows": out_rows,
        **st,
        "rate_x_horizon": DOCS_PER_EVENT_SECOND * 7200,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 4_000_000]
    from auto_ts_spark import get_spark

    spark = get_spark("probe_streaming_scale")
    workdir = os.path.abspath(".localdata/probe_stream")
    os.makedirs(workdir, exist_ok=True)
    probe(spark, 20_000, "curate", workdir)  # warmup (JIT, codec, sink)
    for n in sizes:
        for shape in ("curate", "rollup"):
            print(json.dumps(probe(spark, n, shape, workdir)), flush=True)
            spark.catalog.clearCache()
    spark.stop()
