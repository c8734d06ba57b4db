"""Partitioning helpers.

At 100 TB the parquet scan naturally yields thousands of input splits
and every downstream stage is parallel. With small single-row-group
files (the local test fixtures — Spark cannot split a parquet file
below row-group granularity) a CPU-heavy projection chain (md5
shingling, per-element array lambdas, cosine scoring) runs on ONE core
unless we repartition first. ``ensure_parallelism`` is the explicit,
scale-safe version of that: it only ever repartitions *up* to the
cluster's parallelism, so on a real cluster with ample input splits it
is a no-op, while on local fixtures it unlocks all cores for the
compute-bound stage that follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition up (never down) to ``min_partitions``
    (default: ``sparkContext.defaultParallelism``).

    Use immediately before a CPU-bound narrow stage whose input may be
    under-partitioned. The shuffle it introduces is proportional to the
    *input* (cheap) and is skipped entirely when the input already has
    enough partitions — so it never hurts the large-scale plan.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
