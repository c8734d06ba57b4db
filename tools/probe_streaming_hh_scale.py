"""Streaming heavy-hitters scale probe (r11): the one r10-new operator
without a multi-decade measurement (`streaming/ops.py
streaming_heavy_hitters` — term-sharded Misra-Gries via
applyInPandasWithState).

Claims under test, per the operator's docstring:

1. THROUGHPUT FLAT: wall scales ~linearly with the stream (rows/s
   flat 1M → 4M events) — each micro-batch folds into per-shard
   summaries whose size never grows past `capacity`.
2. STATE BOUNDED: the state store holds exactly n_shards rows forever
   (one Misra-Gries summary per shard), and every emitted summary
   carries ≤ capacity terms — independent of the term universe, which
   this source grows linearly with n (a unique term per doc).
3. CERTIFICATE: est ≤ true ≤ est + defl for every surviving term
   (checked for the top-20 against exact batch counts), and an
   ample-capacity run (universe/shard < capacity) ends with
   defl == 0 on every shard — exact, self-certified.

Source: fixed 18k-row files, maxFilesPerTrigger=4 → batch size is
constant, batch COUNT grows with n (the regime where per-batch state
folding matters). Text per doc: one hot term (20-term pool), one mid
term (1k pool), one unique term — so the universe is ~n while the
top-20 is unambiguous.

Usage: python tools/probe_streaming_hh_scale.py [n_docs ...]
  default: 1000000 4000000
Prints one JSON line per (scale, config).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS_PER_FILE = 18_000
FILES_PER_TRIGGER = 4


def make_source(spark, n: int, path: str, vocab: int = 0) -> None:
    """vocab == 0: a unique term per doc (universe ~n — the tight-
    capacity regime). vocab > 0: third term drawn from a bounded pool
    (the ample-capacity regime where Misra-Gries must stay EXACT and
    emitted summaries stay small)."""
    from pyspark.sql import functions as F

    third = (
        F.concat(F.lit("w"), F.pmod(F.col("id"), F.lit(vocab)))
        if vocab
        else F.concat(F.lit("uniq"), F.col("id"))
    )
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(F.lit("hot"), F.pmod(F.col("id"), F.lit(20))),
            F.concat(F.lit("mid"), F.pmod(F.col("id"), F.lit(1000))),
            third,
        ).alias("text"),
    )
    n_files = max(2, -(-n // ROWS_PER_FILE))
    df.repartitionByRange(n_files, "doc_id").write.mode("overwrite").parquet(path)
    parts = sorted(
        f for f in os.listdir(path) if f.startswith("part-") and f.endswith(".parquet")
    )
    base_mt = int(time.time()) - len(parts) - 10
    for i, f in enumerate(parts):
        os.utime(os.path.join(path, f), (base_mt + i, base_mt + i))


def probe(
    spark, n: int, capacity: int, workdir: str, label: str, vocab: int = 0
) -> dict:
    from pyspark.sql import functions as F

    from auto_ts_spark.streaming.ops import streaming_heavy_hitters

    src = os.path.join(workdir, f"hh_src_{n}_v{vocab}")
    if not os.path.exists(src):
        make_source(spark, n, src, vocab)
    sink = os.path.join(workdir, f"hh_sink_{label}_{n}")
    ck = os.path.join(workdir, f"hh_ck_{label}_{n}")
    for d in (sink, ck):
        shutil.rmtree(d, ignore_errors=True)

    reader = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
        .parquet(src)
    )
    out = streaming_heavy_hitters(reader, capacity=capacity, n_shards=8)
    t0 = time.perf_counter()
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    progs = [json.loads(p.json) if hasattr(p, "json") else dict(p) for p in q.recentProgress]
    n_batches = sum(1 for p in progs if p.get("numInputRows", 0) > 0)
    state_rows = max(
        (
            so.get("numRowsTotal", 0)
            for p in progs
            for so in (p.get("stateOperators") or [])
        ),
        default=0,
    )

    # final summary = each shard's max-seq rows (forecast-state pattern)
    from pyspark.sql import Window

    raw = spark.read.parquet(sink)
    w = Window.partitionBy("shard")
    final = raw.withColumn("_mx", F.max("seq").over(w)).filter(
        F.col("seq") == F.col("_mx")
    )
    per_shard = (
        final.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_terms"), F.max("defl").alias("defl"))
        .collect()
    )
    max_terms = max(r["n_terms"] for r in per_shard)
    max_defl = max(r["defl"] for r in per_shard)

    # certificate vs exact batch counts for the top 20 estimates
    from auto_ts_spark.functions import text as TX

    true_counts = (
        spark.read.parquet(src)
        .select(F.explode(TX.tokens(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    top = final.orderBy(F.desc("est")).limit(20)
    chk = (
        top.join(true_counts, "term", "left")
        .select(
            F.min(F.col("true_cnt") - F.col("est")).alias("min_gap"),
            F.max(F.col("true_cnt") - F.col("est")).alias("max_gap"),
            F.max("defl").alias("defl"),
        )
        .collect()[0]
    )
    cert_holds = bool(chk["min_gap"] >= 0 and chk["max_gap"] <= chk["defl"])
    return {
        "config": label,
        "n_docs": n,
        "capacity": capacity,
        "wall_s": round(wall, 1),
        "rows_per_s": int(n / wall),
        "n_batches": n_batches,
        "state_store_rows": state_rows,
        "max_summary_terms": max_terms,
        "max_defl": int(max_defl),
        "topk_cert_holds": cert_holds,
        "topk_max_undercount": int(chk["max_gap"]),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 4_000_000]
    from auto_ts_spark import get_spark

    spark = get_spark("probe_streaming_hh_scale")
    workdir = os.path.abspath(".localdata/probe_stream")
    os.makedirs(workdir, exist_ok=True)
    probe(spark, 20_000, 4096, workdir, "warmup")
    for n in sizes:
        # tight capacity: universe/shard >> capacity, deflation certified
        print(json.dumps(probe(spark, n, 4096, workdir, "tight")), flush=True)
    # ample capacity at the largest scale over a bounded 100k-term
    # vocabulary (12.5k terms/shard << capacity): defl must end 0
    print(
        json.dumps(
            probe(spark, sizes[-1], 65_536, workdir, "ample", vocab=100_000)
        ),
        flush=True,
    )
    spark.stop()
