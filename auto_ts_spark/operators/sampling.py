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
