"""Corpus drift detection — compare two snapshots of a dataset
(yesterday's crawl vs today's, the corpus before and after a pipeline
change) column by column, the monitoring step a production
training-data pipeline runs on every refresh.

Numeric columns (``drift_profile``) compare on a shared bucket grid;
categorical columns (``categorical_drift_profile``) compare category
masses directly. Numeric metrics:

- **PSI** (population stability index), the industry drift metric:
  ``Σ (p_new - p_old) · ln(p_new / p_old)`` over buckets, with
  epsilon-smoothed proportions. Rule of thumb: < 0.1 stable,
  0.1-0.25 moderate shift, > 0.25 action needed.
- **KS** (two-sample Kolmogorov-Smirnov statistic) on the bucketed
  CDFs: ``max |F_old - F_new|``. Grid-resolution-bounded, which is
  the standard large-sample practice — the exact statistic needs a
  global per-column sort no sane 100 TB job runs for monitoring.

Spark-first shape: the grid cuts come from one min/max (or
approx-quantile) pass over the OLD side; each side is then scanned
exactly ONCE — every profiled column melts into (column, value) rows
through a single explode, bucket assignment is an arithmetic
projection, and the union of both sides aggregates per (column,
bucket) with map-side partial aggregation. The per-column CDF window
runs over ≤ buckets+1 rows per column — bounded, never a data-sized
sort. Driver state is O(cols × buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def drift_profile(
    old: DataFrame,
    new: DataFrame,
    *,
    cols: list[str],
    buckets: int = 20,
    cuts: str = "linear",
    eps: float = 1e-6,
) -> DataFrame:
    """Per-column drift metrics between two snapshots.

    Returns one row per column: ``(column, n_old, n_new, ks, psi)``
    (metrics rounded to 6 decimals; NULL values are excluded from
    both sides). A column with zero non-null rows on a side still
    gets its row — counts are 0 and the metrics are NULL (undefined
    against an empty side), never a divide-by-zero failure.

    ``cuts="linear"`` grids ``buckets`` equal-width bins over the OLD
    side's [min, max] — fully deterministic, the mode the cross-engine
    value check uses. ``cuts="quantile"`` uses approxQuantile cut
    points of the old side (equal-mass bins, the usual PSI setup —
    approximate, engine-specific). New-side values outside the old
    range land in the edge buckets, so a range shift is visible as
    edge-bucket mass, not silently dropped."""
    if cuts not in ("linear", "quantile"):
        raise ValueError(f"unknown cuts mode: {cuts!r}")
    if buckets < 2:
        raise ValueError("need at least 2 buckets")

    # one pass over the old side for every column's cut points
    if cuts == "linear":
        bounds = old.agg(
            *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
            *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
        ).collect()[0]
        cut_points = {}
        for c in cols:
            mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
            if mn is None or mx is None or mx <= mn:
                mx = (mn or 0.0) + 1.0
                mn = mn or 0.0
            step = (mx - mn) / buckets
            cut_points[c] = [mn + i * step for i in range(1, buckets)]
    else:
        probs = [i / buckets for i in range(1, buckets)]
        qs = old.approxQuantile(cols, probs, 0.001)
        cut_points = dict(zip(cols, qs))

    def side_counts(df: DataFrame, side: str) -> DataFrame:
        # ONE scan per side: melt every profiled column into
        # (column, v) rows via a single explode, then assign the
        # bucket with a per-column comparison-count expression —
        # a per-column union would re-execute the upstream plan once
        # per column, ruinous when the snapshot is a computed pipeline
        melted = (
            df.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(c).alias("column"),
                                F.col(c).cast("double").alias("v"),
                            )
                            for c in cols
                        ]
                    )
                ).alias("kv")
            )
            .select("kv.column", "kv.v")
            .filter(F.col("v").isNotNull())
        )
        # bucket index = how many cuts the value exceeds — a sum of
        # comparisons (seeded with lit(0) so a column with NO cuts,
        # e.g. an all-NULL old side under quantile mode, still yields
        # a Column, not a Python int)
        bucket = F.lit(None).cast("int")
        for c in cols:
            idx = sum(
                ((F.col("v") > F.lit(cut)).cast("int") for cut in cut_points[c]),
                F.lit(0),
            )
            bucket = F.when(F.col("column") == c, idx).otherwise(bucket)
        return melted.select(
            "column", bucket.alias("bucket"), F.lit(side).alias("side")
        )

    counts = (
        side_counts(old, "old")
        .unionByName(side_counts(new, "new"))
        .groupBy("column", "bucket")
        .agg(
            F.sum(F.when(F.col("side") == "old", 1).otherwise(0)).alias("c_old"),
            F.sum(F.when(F.col("side") == "new", 1).otherwise(0)).alias("c_new"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("column")
    worder = (
        Window.partitionBy("column")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # bounded windows: ≤ buckets+1 rows per column partition.
    # try_divide everywhere a snapshot count is the divisor: a column
    # that is all-NULL on one side (exactly the regression drift
    # detection exists to catch) must report NULL metrics for that
    # column, not kill the whole monitoring job with DIVIDE_BY_ZERO
    enriched = counts.withColumn("n_old", F.sum("c_old").over(w)).withColumn(
        "n_new", F.sum("c_new").over(w)
    )
    p_old = F.try_divide(F.col("c_old"), F.col("n_old"))
    p_new = F.try_divide(F.col("c_new"), F.col("n_new"))
    sm_old = p_old + eps
    sm_new = p_new + eps
    enriched = (
        enriched.withColumn("cum_old", F.sum("c_old").over(worder))
        .withColumn("cum_new", F.sum("c_new").over(worder))
        .withColumn(
            "psi_term", (sm_new - sm_old) * F.log(sm_new / sm_old)
        )
        .withColumn(
            "cdf_gap",
            F.abs(
                F.try_divide(F.col("cum_old"), F.col("n_old"))
                - F.try_divide(F.col("cum_new"), F.col("n_new"))
            ),
        )
    )
    metrics = enriched.groupBy("column").agg(
        F.max("n_old").cast("bigint").alias("n_old"),
        F.max("n_new").cast("bigint").alias("n_new"),
        F.round(F.max("cdf_gap"), 6).alias("ks"),
        F.round(F.sum("psi_term"), 6).alias("psi"),
    )
    # a column with zero non-null rows on BOTH sides emits no count
    # rows at all — re-seat it so every requested column gets a row
    skeleton = old.sparkSession.createDataFrame(
        [(c,) for c in cols], "column string"
    )
    return (
        skeleton.join(metrics, "column", "left")
        .select(
            "column",
            F.coalesce("n_old", F.lit(0)).cast("bigint").alias("n_old"),
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
            "ks",
            "psi",
        )
        .orderBy("column")
    )


def categorical_drift_profile(
    old: DataFrame,
    new: DataFrame,
    *,
    cols: list[str],
    top_k: int = 50,
    eps: float = 1e-6,
) -> DataFrame:
    """Per-column drift metrics for CATEGORICAL columns between two
    snapshots — the source-mix / language-distribution check a corpus
    pipeline runs on every refresh.

    Returns one row per column: ``(column, n_old, n_new, tv, psi)``
    where ``tv`` is total-variation distance (``0.5 · Σ|p_old -
    p_new|``, 0 = identical mix, 1 = disjoint) and ``psi`` the
    population stability index over the category masses, both computed
    on the ``top_k`` categories by combined count with everything else
    collapsed into one ``__other__`` bucket (so the metric space stays
    bounded regardless of tail cardinality). NULL category values
    count as their own ``__null__`` category — a column going NULL is
    drift, not missing data to ignore.

    Scale contract: counts aggregate distributedly (one shuffle), but
    the top-k rank runs one bounded window task PER COLUMN over its
    distinct (value, count) rows — intended for bounded-cardinality
    columns (language, source, event type). Hash or bucket
    high-cardinality columns upstream."""
    from pyspark.sql import Window

    if top_k < 1:
        raise ValueError("top_k must be positive")

    def side(df: DataFrame, flag: str) -> DataFrame:
        return df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column"),
                            F.coalesce(
                                F.col(c).cast("string"), F.lit("__null__")
                            ).alias("v"),
                        )
                        for c in cols
                    ]
                )
            ).alias("kv"),
        ).select("kv.column", "kv.v", F.lit(flag).alias("side"))

    counts = (
        side(old, "old")
        .unionByName(side(new, "new"))
        .groupBy("column", "v")
        .agg(
            F.sum(F.when(F.col("side") == "old", 1).otherwise(0)).alias("c_old"),
            F.sum(F.when(F.col("side") == "new", 1).otherwise(0)).alias("c_new"),
        )
    )
    # deterministic top-k per column (combined count desc, value asc
    # tie-break); the rest collapses into __other__
    wrank = Window.partitionBy("column").orderBy(
        (F.col("c_old") + F.col("c_new")).desc(), F.col("v").asc()
    )
    bucketed = (
        counts.withColumn("_rk", F.row_number().over(wrank))
        .withColumn(
            "cat", F.when(F.col("_rk") <= top_k, F.col("v")).otherwise("__other__")
        )
        .groupBy("column", "cat")
        .agg(F.sum("c_old").alias("c_old"), F.sum("c_new").alias("c_new"))
    )
    w = Window.partitionBy("column")
    enriched = bucketed.withColumn("n_old", F.sum("c_old").over(w)).withColumn(
        "n_new", F.sum("c_new").over(w)
    )
    p_old = F.try_divide(F.col("c_old"), F.col("n_old"))
    p_new = F.try_divide(F.col("c_new"), F.col("n_new"))
    sm_old = p_old + eps
    sm_new = p_new + eps
    # tv accumulates as an EXACT integer numerator (|c_old·n_new −
    # c_new·n_old| in decimal(38,0) — counts are longs, so products
    # stay exact) with one final division, so the statistic cannot
    # drift with float-summation order across engines/partials; psi is
    # irreducibly float (logs) and rounds from a float sum
    enriched = enriched.withColumn(
        "tv_num",
        F.abs(
            F.col("c_old").cast("decimal(38,0)") * F.col("n_new")
            - F.col("c_new").cast("decimal(38,0)") * F.col("n_old")
        ),
    ).withColumn("psi_term", (sm_new - sm_old) * F.log(sm_new / sm_old))
    metrics = enriched.groupBy("column").agg(
        F.max("n_old").cast("bigint").alias("n_old"),
        F.max("n_new").cast("bigint").alias("n_new"),
        F.round(
            F.try_divide(
                F.sum("tv_num").cast("double"),
                2.0 * F.max("n_old") * F.max("n_new"),
            ),
            6,
        ).alias("tv"),
        F.round(F.sum("psi_term"), 6).alias("psi"),
    )
    skeleton = old.sparkSession.createDataFrame(
        [(c,) for c in cols], "column string"
    )
    return (
        skeleton.join(metrics, "column", "left")
        .select(
            "column",
            F.coalesce("n_old", F.lit(0)).cast("bigint").alias("n_old"),
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
            "tv",
            "psi",
        )
        .orderBy("column")
    )
