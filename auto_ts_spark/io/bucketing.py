"""Bucketed tables: pay the join shuffle once, at write time.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders on
orderkey) is shuffling BOTH sides onto the join key — every time the
join runs. Bucketing amortizes that: each table is hash-partitioned
into the same number of buckets on the key (and sorted within buckets)
when it is written, so every subsequent equi-join on that key is a
sort-merge join over co-located buckets with **no Exchange on either
side**. The reference operates on single-node pandas frames and has no
analogue (SURVEY.md §2.5 joins are all in-memory merges); this is the
Spark-native answer to "the same big join runs in every pipeline".

Scale guidance:
- ``num_buckets`` should put one bucket's rows comfortably in one
  task's memory at the target scale (100 TB lineitem → O(10⁴) buckets);
  locally the tests use single digits.
- Both sides MUST use the same bucket count (Spark 4 can also coalesce
  mismatched-but-divisible bucket counts via
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
- Within-bucket ``sortBy`` lets the merge phase skip its Sort when each
  bucket holds a single file (write with one task per bucket to
  guarantee that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (re-export convenience)


def _drop_table_and_location(spark: SparkSession, table: str) -> None:
    """Drop ``table`` AND any orphaned warehouse directory left by a
    previous session. With the default in-memory catalog the table
    registration dies with the session but its managed location
    survives on disk, and the next ``saveAsTable`` fails with
    LOCATION_ALREADY_EXISTS. With a persistent metastore (production)
    the DROP TABLE alone is sufficient and the rmtree never fires."""
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    try:
        import os
        import shutil
        from urllib.parse import urlparse

        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        parsed = urlparse(warehouse)
        if parsed.scheme in ("", "file"):
            loc = os.path.join(parsed.path or warehouse, table.lower())
            if os.path.exists(loc):
                shutil.rmtree(loc)
    except Exception:
        pass  # non-local warehouse: the catalog drop is authoritative


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: str | list[str],
    num_buckets: int,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> str:
    """Persist ``df`` as a parquet table bucketed (and bucket-sorted) on
    the join key. Returns the table name.

    The ``repartition`` on the bucket key before the write makes each
    output bucket a SINGLE file written by the task that owns that hash
    slot — this both bounds small-file count and preserves the sortBy
    guarantee that lets later merges skip sorting.
    """
    if mode == "overwrite":
        _drop_table_and_location(df.sparkSession, table)
    keys = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    sorts = (
        keys
        if sort_by is None
        else ([sort_by] if isinstance(sort_by, str) else list(sort_by))
    )
    writer = (
        df.repartition(num_buckets, *[F.col(k) for k in keys])
        .write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, keys[0], *keys[1:])
        .sortBy(sorts[0], *sorts[1:])
    )
    writer.saveAsTable(table)
    return table


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables registered by :func:`write_bucketed`.

    When both tables are bucketed on their join keys with equal bucket
    counts, the physical plan is a SortMergeJoin whose children are bare
    bucketed scans — zero Exchange operators (verified by
    ``tests/test_bucketing.py``).
    """
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
