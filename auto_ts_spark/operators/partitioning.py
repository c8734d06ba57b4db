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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the big side gets a random salt in
    [0, n_salts); the small side is replicated once per salt value; the
    join key becomes (key, salt), splitting each hot key's rows across
    ``n_salts`` tasks.

    AQE's skew-join split (enabled in the session factory) handles most
    skew automatically — use this for the residual cases AQE can't
    split (e.g. a single key too hot for one task even after split, or
    deliberately partitioned sinks). Result set is identical to a plain
    join (tested); the salt never leaves this function.
    """
    from pyspark.sql import functions as F

    salted_big = big.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(salted_small, [key, "_salt"], how).drop("_salt")
