"""Deterministic sampling and dataset-split assignment.

Training-data pipelines need splits that are (a) reproducible across
runs, engines, and cluster sizes, (b) stable under re-partitioning,
and (c) content-addressed — a document keeps its split when the corpus
around it changes. Spark's ``randomSplit`` gives none of these (it is
partition-order dependent). These operators derive the assignment from
an md5 hash of the row id + seed, so the split is a pure projection:
no shuffle, no state, bit-reproducible in any engine with md5
(the DuckDB oracle re-derives it exactly).

Thresholds are integer hash buckets (ppm of the 60-bit hash), never
accumulated floats — ``0.8 + 0.1 != 0.9`` in IEEE doubles, and a
boundary row must land in the same split in every engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from auto_ts_spark.functions import text as TX

_DENOM = 1_000_000


def _bucket(id_col: Column, seed: int) -> Column:
    """Integer bucket in [0, 1e6) from the md5-60-bit hash of id:seed."""
    h = TX.hash60(F.concat(id_col.cast("string"), F.lit(f":{seed}")))
    return h % _DENOM


def deterministic_sample(
    df: DataFrame, fraction: float, *, id_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by id hash — same rows every
    run, on any partitioning, in any engine."""
    return df.filter(_bucket(F.col(id_col), seed) < int(round(fraction * _DENOM)))


def hash_split(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by cumulative hash bucket:
    the first split whose cumulative ppm threshold exceeds the row's
    bucket. Weights are normalized; assignment is a single projection
    (no shuffle) and content-addressed by ``id_col``."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    b = _bucket(F.col(id_col), seed)
    expr: Column | None = None
    cum = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        cum += w / total
        cond = b < int(round(cum * _DENOM))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    *,
    key_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    default_rate: float = 0.0,
    copy_col: str = "copy_n",
) -> DataFrame:
    """Domain/source mixture sampling — the corpus-mixing step
    training pipelines run to hit a target source distribution (the
    Pile/Dolma-style per-source epoch weights): each source is down-
    OR up-sampled by its rate.

    Rate r for a row's ``key_col`` value means: ``floor(r)``
    guaranteed copies plus one more iff the row's content-addressed
    hash bucket falls under ``frac(r)`` — so r=0.25 keeps a
    deterministic quarter of the source, r=2.5 emits 2 copies of every
    document and a third for a quarter of them. Copies are numbered in
    ``copy_col`` (1..k) so downstream shuffles can still distinguish
    rows. Like every operator here this is a pure projection + explode
    (no shuffle, no state), content-addressed by ``id_col`` — the same
    document gets the same fate on any cluster, any partitioning, any
    engine. Keys absent from ``rates`` fall back to ``default_rate``
    (0 = an explicit mixture drops unlisted sources)."""
    b = _bucket(F.col(id_col), seed)
    rate_expr: Column = F.lit(float(default_rate))
    for key, r in rates.items():
        rate_expr = (
            F.when(F.col(key_col) == key, F.lit(float(r))).otherwise(rate_expr)
        )
    whole = F.floor(rate_expr).cast("int")
    frac_ppm = F.round((rate_expr - F.floor(rate_expr)) * _DENOM).cast("long")
    n_copies = whole + (b < frac_ppm).cast("int")
    return (
        df.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") > 0)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(1), F.col("_n_copies"))))
        .drop("_n_copies")
    )


def stratified_sample(
    df: DataFrame,
    n_per_stratum: int,
    *,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """EXACTLY ``n_per_stratum`` rows per stratum (fewer only when the
    stratum is smaller), chosen content-addressed: rows are ranked
    inside each stratum by the md5 hash of id:seed and the first n
    win. Unlike ``DataFrame.sampleBy`` (Bernoulli — per-stratum counts
    are random variables) the output size is deterministic AND the
    chosen set is stable across runs, partitionings, and engines, so
    an eval set drawn this way is reproducible anywhere md5 exists
    (the DuckDB oracle re-derives it row-identically).

    Scale shape: one shuffle on the stratum key; the per-stratum
    window ranks within each hash partition in parallel. Strata are
    assumed plural (sources, languages, shards) — a single giant
    stratum degenerates to one task, which is the same boundary every
    per-key window in this repo documents (operators/lags.py sharded
    variants for that regime)."""
    h = TX.hash60(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def demo_centroids(k: int = 4, dim: int = 64) -> list[list[float]]:
    """Exact-DYADIC centroid grid for the oracle-checked
    ``cluster_balanced_sample`` query: every coordinate is a multiple
    of 1/8, so the same decimal literal converts to the identical
    binary double in Spark and DuckDB and the argmin assignment is
    engine-invariant (a non-dyadic literal could flip a near-tie by
    one ulp between engines)."""
    return [
        [((j * 7 + d * 3) % 16 - 8) / 8.0 for d in range(dim)] for j in range(k)
    ]


def cluster_balanced_sample(
    df: DataFrame,
    per_cluster: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids=None,
    n_centroids: int = 16,
    sample_size: int = 2048,
    seed: int = 42,
    hof_max_literals: int = 8192,
) -> DataFrame:
    """Cluster-balanced selection over an embedding column — the
    topic-balancing step of a curation pipeline (cluster the corpus,
    keep an equal quota per cluster so oversampled topics cannot
    dominate the mixture; the selection-side sibling of SemDeDup's
    cluster-then-prune shape). Returns the input columns plus
    ``cluster``, with EXACTLY ``per_cluster`` rows per cluster (fewer
    only when a cluster is smaller), chosen content-addressed by the
    md5 rank of id:seed — deterministic across runs, partitionings,
    and engines, like ``stratified_sample``.

    ``centroids`` explicit (list/array, the oracle-checkable form) or
    ``None`` → trained with the IVF machinery: layout-invariant
    driver-side sample + deterministic Lloyd k-means
    (operators/similarity.py — the coarse quantizer is k·dim floats,
    broadcast, never a corpus-scale object).

    Scale shape: centroid assignment is ONE shuffle-free projection —
    JVM-side ``zip_with``/``aggregate`` fold when k·dim fits in
    ``hof_max_literals`` (no Python in the hot path), else the
    Arrow-batched pandas UDF against a broadcast centroid matrix that
    IVF assignment uses. The quota cut is one exchange on the cluster
    key + a per-cluster window rank; clusters are assumed plural (k is
    16-1024 in practice) — the same single-giant-stratum boundary
    ``stratified_sample`` documents."""
    if per_cluster < 1:
        raise ValueError(f"per_cluster must be >= 1, got {per_cluster}")
    import numpy as np

    from auto_ts_spark.operators import similarity as SIM

    if centroids is None:
        sample = SIM._quantizer_sample(df, id_col, vec_col, sample_size, seed)
        cents = SIM.kmeans_centroids(sample, n_centroids, seed=seed)
    else:
        cents = np.asarray(centroids, dtype=np.float64)
        if cents.ndim != 2:
            raise ValueError(f"centroids must be (k, dim), got {cents.shape}")
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    if cents.size <= hof_max_literals:
        # JVM path: per-centroid squared L2 via a sequential fold —
        # the SAME element order and addend values the DuckDB oracle's
        # list_sum(list_transform(list_zip(...))) computes, so the
        # argmin is engine-invariant
        dists = []
        for j, c in enumerate(cents):
            lit = F.array(*[F.lit(float(x)) for x in c])
            d2 = F.aggregate(
                F.zip_with(vec_d, lit, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            dists.append(F.struct(d2.alias("d"), F.lit(j).alias("j")))
        # struct comparison is lexicographic: min by (distance, index)
        # — ties break to the lowest cluster id, matching np.argmin
        cluster = F.array_min(F.array(*dists))["j"]
        assigned = df.withColumn("cluster", cluster)
    else:
        bc = df.sparkSession.sparkContext.broadcast(cents)
        assigned = df.withColumn("cluster", SIM._nearest_cell_udf(bc)(F.col(vec_col)))
    h = TX.hash60(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))
    w = Window.partitionBy("cluster").orderBy(h.asc(), F.col(id_col).asc())
    return (
        assigned.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= per_cluster)
        .drop("_rk")
    )
