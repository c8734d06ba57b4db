"""Probe (r14, verdict #5): exercise BOTH branches of the
size-gated daily-series cache (partitioning.cache_if_costly) against
a REAL big input — the >256 MB branch was unit-tested in r13 but
never run against data that actually crosses the gate.

Method: generate a synthetic decade of events as parquet large enough
that the scan's compile-time sizeInBytes estimate crosses
CACHE_INPUT_MIN_BYTES (the estimate is the file size, so this is the
honest production trigger). Then time a multi-branch consumer — the
seasonal-decompose shape: base + phase + grand-mean branches over the
shared daily series — with the gate at its default (cache engages)
vs forced off (CACHE_INPUT_MIN_BYTES monkeypatched to +inf, every
branch re-scans). ABBA order, median of 3 per arm, noop sink.

Usage: python tools/probe_daily_cache_scale.py [n_rows]
  default n_rows = 30_000_000 (~0.5 GB parquet with the entropy cols)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from auto_ts_spark.operators import partitioning as PART
from auto_ts_spark.session import get_spark
from pyspark.sql import functions as F


def gen_events(spark, path: str, n_rows: int) -> None:
    if os.path.exists(os.path.join(path, "events.parquet", "_SUCCESS")):
        return
    decade_sec = 10 * 365 * 24 * 3600
    (
        spark.range(n_rows)
        .select(
            F.timestamp_seconds(
                F.lit(1577836800)  # 2020-01-01
                + (F.pmod(F.xxhash64("id"), F.lit(decade_sec)))
            ).alias("ts"),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)) / 100.0).alias(
                "value"
            ),
            # entropy padding so the parquet honestly crosses the gate
            # (production events tables are wide; the gate keys on the
            # INPUT relation's size, same as here)
            F.xxhash64("id", F.lit(2)).alias("pad1"),
            F.xxhash64("id", F.lit(3)).alias("pad2"),
            F.xxhash64("id", F.lit(4)).alias("pad3"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(path, "events.parquet"))
    )


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000_000
    base = "/root/repo/.localdata/events_decade"
    spark = get_spark("probe_daily_cache")
    gen_events(spark, base, n_rows)

    ev = E.load_table(spark, base, "events")
    raw = ev._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    est = int(raw if isinstance(raw, int) else raw.toString())
    print(
        f"events rows={ev.count():,} estimate={est/1e6:.0f} MB "
        f"gate={PART.CACHE_INPUT_MIN_BYTES/1e6:.0f} MB "
        f"crosses={est >= PART.CACHE_INPUT_MIN_BYTES}"
    )

    def consumer():
        # the seasonal-decompose consumer shape: three plan branches
        # over the shared daily series (base join phase join grand)
        s = E._daily_series(spark, base)
        base_b = s.select("series_id", "ts", "y")
        phase = s.groupBy("series_id").agg(F.avg("y").alias("mean_y"))
        grand = s.groupBy().agg(F.sum("y").alias("total"))
        return (
            base_b.join(phase, "series_id")
            .crossJoin(grand)
            .select("ts", "y", "mean_y", "total")
        )

    def run_once() -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        consumer().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    results: dict[str, list[float]] = {"gate_on(cache)": [], "gate_off(rescan)": []}
    default_gate = PART.CACHE_INPUT_MIN_BYTES
    for order in ("AB", "BA", "AB"):
        for arm in order:
            if arm == "A":
                PART.CACHE_INPUT_MIN_BYTES = default_gate
                results["gate_on(cache)"].append(run_once())
            else:
                PART.CACHE_INPUT_MIN_BYTES = 1 << 60  # never cache
                results["gate_off(rescan)"].append(run_once())
    PART.CACHE_INPUT_MIN_BYTES = default_gate

    # confirm the gate-on branch really cached: the plan must hold an
    # InMemoryRelation after one action
    spark.catalog.clearCache()
    c = consumer()
    c.write.format("noop").mode("overwrite").save()
    plan = c._jdf.queryExecution().executedPlan().toString()
    print("gate-on plan has InMemoryTableScan:", "InMemoryTableScan" in plan)
    spark.catalog.clearCache()

    for arm, vals in results.items():
        print(
            f"{arm}: runs={[round(v, 2) for v in vals]} "
            f"median={statistics.median(vals):.2f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
