"""SparkSession factory tuned for both local testing and cluster scale.

Design notes (100 TB target):
- AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  replaces hand-tuned ``spark.sql.shuffle.partitions`` at scale.
- UTC session timezone pinned so timestamp semantics match the DuckDB
  oracle (DuckDB timestamps are UTC-naive).
- Arrow enabled: every pandas-UDF / applyInPandas stage transfers
  columnar batches, not pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "auto_ts_spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    On a real cluster the caller supplies master/executor settings
    externally (spark-submit); everything here is master-agnostic
    except the local[] fallback.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Spark's compiled-codegen class cache holds only 100 entries by
        # default (static conf, shared by every job in the JVM). An
        # application that runs more than ~100 distinct operator shapes
        # — any real multi-query pipeline, and this engine's curate()
        # alone generates dozens — evicts and re-Janino-compiles
        # constantly; measured here, one cold curate_full pays ~100 s of
        # JIT/codegen CPU and a re-run after 29 other queries still pays
        # ~12 s. Entries are compiled classes (class metadata, not data),
        # so the memory cost of 5000 entries is tens of MB of metaspace.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "5000"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
