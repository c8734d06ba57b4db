"""Probe: does the 100-entry codegen class cache (static conf
``spark.sql.codegen.cache.maxEntries``) thrash across the bench's
query interleave?

Method: in ONE session, time curate_full (3 back-to-back runs — the
warm floor), then run every other headline query once (the bench's
interleave), then time curate_full again. If the post-interleave run
re-inflates toward the cold number under the default cache (100) but
stays at the warm floor with a raised cache, the bench's per-query
medians are dominated by Janino recompilation, not by the plans.

Usage: python tools/probe_codegen_cache.py [maxEntries]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B
import __spark_entry__ as E
from pyspark.sql import SparkSession, functions as F


def main() -> None:
    entries = sys.argv[1] if len(sys.argv) > 1 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName("probe_codegen_cache")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
    )
    if entries is not None:
        builder = builder.config("spark.sql.codegen.cache.maxEntries", entries)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    qs = dict(
        E.queries(), curate_chain=B.q_curate_chain, curate_full=B.q_curate_full
    )

    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    import subprocess

    jvm_pid = int(
        subprocess.check_output(
            ["pgrep", "-P", str(os.getpid()), "java"], text=True
        ).split()[0]
    )
    clk = os.sysconf("SC_CLK_TCK")

    def telemetry() -> tuple[float, float, float]:
        gc_ms = sum(
            b.getCollectionTime() for b in mf.getGarbageCollectorMXBeans()
        )
        jit_ms = mf.getCompilationMXBean().getTotalCompilationTime()
        with open(f"/proc/{jvm_pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        cpu_s = (int(parts[11]) + int(parts[12])) / clk  # utime+stime
        return gc_ms / 1e3, jit_ms / 1e3, cpu_s

    def run(name: str) -> float:
        spark.catalog.clearCache()
        g0, j0, c0 = telemetry()
        load = os.getloadavg()[0]
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        g1, j1, c1 = telemetry()
        print(
            f"    [{name}: wall={wall:.2f}s gc+={g1-g0:.2f}s jit+={j1-j0:.2f}s "
            f"jvmcpu+={c1-c0:.1f}s load={load:.1f}]",
            flush=True,
        )
        return wall

    print(f"maxEntries={entries or 'default(100)'}")
    for i in range(3):
        print(f"curate_full warm-in run {i}: {run('curate_full'):.2f}s", flush=True)
    others = [n for n in B.HEADLINE if n != "curate_full"]
    t0 = time.perf_counter()
    for n in others:
        run(n)
    print(f"interleave ({len(others)} queries once): {time.perf_counter()-t0:.2f}s", flush=True)
    for i in range(2):
        print(f"curate_full post-interleave run {i}: {run('curate_full'):.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
