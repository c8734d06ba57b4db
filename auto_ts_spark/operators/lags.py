"""Window operators over the time axis: lag matrix, differencing,
cumulative restore, rolling stats, ACF.

Reference parity (SURVEY.md §2.3):
- W1 ``convert_timeseries_dataframe_to_supervised`` (auto_ts/utils/etl.py:248-317)
  → :func:`supervised_lag_matrix`
- W2 one-step predictor shift (auto_ts/__init__.py:700-703) → :func:`shift`
- W3 differencing (auto_ts/__init__.py:350-351) → :func:`difference`
- W4 cumsum restore (auto_ts/models/build_pyflux.py:91-106) → :func:`cumulative_sum`
- W5 rolling mean/std (auto_ts/utils/eda.py:234-242) → :func:`rolling_stats`
- W9 zero-variance drop (auto_ts/models/build_ml.py:842-845) → :func:`drop_zero_variance`
- W10 univariate lag helpers (auto_ts/models/build_ml.py:1128-1146) → :func:`add_lags`
- W17 ACF (auto_ts/utils/eda.py:102-117) → :func:`acf`

Scale notes: every function windows over
``Window.partitionBy("series_id").orderBy(ts)`` — with millions of
series the work distributes across executors with one shuffle on
series_id (and Catalyst reuses that single partitioning across all lag
columns: N lags = one shuffle, one window node). For a single giant
series that window degenerates to one task — use the ``sharded_*``
variants below, which time-shard the series (partitioning.shard_series:
two-pass global row number → shard id → boundary rows spliced into the
next shard as context) so one 100 TB series becomes n/shard_rows
independent tasks with bit-identical results (parity-tested).

Measured crossover (BASELINE.md r3 probe): sharding costs ~3 shuffles
vs the global path's one, so the global single-task sort wins at 2M
rows (3.8 s vs 9.8 s) and breaks even around 10M (9.2 s vs 10.5 s on
local[32]). Past that the single sort task degrades super-linearly
and eventually spills/OOMs — it stays n/shard_rows-parallel at any
size. Since r10 the plain ops pick the sharded variant AUTOMATICALLY
past the crossover (:func:`needs_sharding` — a zero-job compile-time
size gate, then a one-scan per-series count probe); ``sharded_*``
remain callable directly and ``shard_threshold=None`` opts out.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cols_list(cols: Sequence[str]) -> list[str]:
    """Normalize a column spec: a bare string becomes a one-element
    list instead of iterating into per-character column names.

    Shared by every operator that accepts ``Sequence[str]`` column
    specs (window ops here, ``asof.asof_join``, …)."""
    return [cols] if isinstance(cols, str) else list(cols)


_cols_list = cols_list


def series_window(order_col: str = "ts", series_col: str = "series_id"):
    return Window.partitionBy(series_col).orderBy(F.col(order_col))


# measured global-window vs sharded crossover (BASELINE.md r3 probe:
# break-even ~10M rows/series on local[32]; past it the single sort
# task degrades super-linearly and eventually spills)
GIANT_SERIES_ROWS = 10_000_000
# compressed parquet rarely goes below ~4 bytes/row for (key, ts,
# value) rows — a frame smaller than threshold*4 bytes cannot hold a
# threshold-row series, so the probe job is skipped outright
_PROBE_MIN_BYTES_PER_ROW = 4


def needs_sharding(
    df: DataFrame, series_col: str, threshold: int | None
) -> bool:
    """True iff some series exceeds ``threshold`` rows — the adaptive
    strategy pick for the window operators (same AQE-style
    measure-then-choose as ``dedup.connected_components``'
    union-find cutover).

    Two-stage so the common case costs nothing: (1) the optimizer's
    compile-time ``sizeInBytes`` — no job — rules out frames too small
    to hold a giant series (conservative 4 bytes/row floor; join-stat
    overestimates merely fall through to the probe); (2) only then one
    map-side-combined per-series count (one scan, the shuffle is a
    handful of rows per series). A missed borderline case near the
    crossover costs a slightly slower single-task sort, never a wrong
    answer — both paths are parity-tested bit-identical.
    """
    if not threshold:
        return False
    try:
        raw = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        size = int(raw if isinstance(raw, int) else raw.toString())
        if size < threshold * _PROBE_MIN_BYTES_PER_ROW:
            return False
    except Exception:
        pass  # stats unavailable (e.g. Connect) — fall through to the probe
    mx = (
        df.groupBy(series_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"))
        .first()["mx"]
    )
    return (mx or 0) > threshold


def shift(
    df: DataFrame,
    cols: Sequence[str],
    periods: int = 1,
    *,
    order_col: str = "ts",
    series_col: str = "series_id",
    drop_null: bool = True,
) -> DataFrame:
    """Shift columns by ``periods`` (positive = lag, negative = lead)."""
    cols = _cols_list(cols)
    w = series_window(order_col, series_col)
    fn = (lambda c: F.lag(c, periods).over(w)) if periods >= 0 else (lambda c: F.lead(c, -periods).over(w))
    out = df.select(
        *[c for c in df.columns],
        *[fn(c).alias(f"{c}_shift{periods}") for c in cols],
    )
    if drop_null:
        out = out.na.drop(subset=[f"{c}_shift{periods}" for c in cols])
    return out


def supervised_lag_matrix(
    df: DataFrame,
    value_cols: Sequence[str],
    n_in: int = 1,
    n_out: int = 1,
    *,
    order_col: str = "ts",
    series_col: str = "series_id",
    dropnan: bool = True,
    shard_threshold: int | None = GIANT_SERIES_ROWS,
    shard_rows: int = 1 << 20,
) -> DataFrame:
    """Lag/lead matrix: for each var, ``var(t-n_in)..var(t-1), var(t),
    var(t+1)..var(t+n_out-1)``.

    Column naming mirrors the reference's ``var(t-i)`` / ``var(t+i)``
    convention but uses SQL-safe names ``var_lag_i`` / ``var_lead_i``.
    One ``select`` → one Window node → one shuffle regardless of lag
    count.

    Adaptive (r10): lag-only calls (``n_out == 1``) on a frame where
    some series exceeds ``shard_threshold`` rows (:func:`needs_sharding`)
    route to :func:`sharded_lag_matrix` automatically — a naive user
    with one 10⁹-row series no longer lands on a single sort task.
    ``shard_threshold=None`` forces the global window.
    """
    value_cols = _cols_list(value_cols)
    if n_out == 1 and needs_sharding(df, series_col, shard_threshold):
        return sharded_lag_matrix(
            df,
            value_cols,
            n_in,
            shard_rows=shard_rows,
            order_col=order_col,
            series_col=series_col,
            dropnan=dropnan,
        )
    w = series_window(order_col, series_col)
    exprs: list[Column] = [F.col(c) for c in df.columns]
    new_names: list[str] = []
    for i in range(n_in, 0, -1):
        for c in value_cols:
            name = f"{c}_lag_{i}"
            exprs.append(F.lag(F.col(c), i).over(w).alias(name))
            new_names.append(name)
    for i in range(1, n_out):
        for c in value_cols:
            name = f"{c}_lead_{i}"
            exprs.append(F.lead(F.col(c), i).over(w).alias(name))
            new_names.append(name)
    out = df.select(*exprs)
    if dropnan and new_names:
        out = out.na.drop(subset=new_names)
    return out


def add_lags(
    df: DataFrame,
    col: str,
    lags: Sequence[int],
    *,
    order_col: str = "ts",
    series_col: str = "series_id",
) -> DataFrame:
    """``lag_{k}_{col}`` columns (reference naming, build_ml.py:1128-1146)."""
    w = series_window(order_col, series_col)
    return df.select(
        "*", *[F.lag(F.col(col), k).over(w).alias(f"lag_{k}_{col}") for k in lags]
    )


def difference(
    df: DataFrame,
    cols: Sequence[str],
    order: int = 1,
    *,
    order_col: str = "ts",
    series_col: str = "series_id",
    drop_null: bool = True,
    shard_threshold: int | None = GIANT_SERIES_ROWS,
    shard_rows: int = 1 << 20,
) -> DataFrame:
    """Apply ``order`` rounds of first-differencing to ``cols``.

    ``order`` stacked differences compose into one Window stage: Catalyst
    collapses the chained ``col - lag(col,1)`` projections over the same
    window spec, so this stays a single shuffle.

    Adaptive (r10): giant series route to :func:`sharded_difference`
    (see :func:`supervised_lag_matrix`); ``shard_threshold=None``
    forces the global window.
    """
    cols = _cols_list(cols)
    if needs_sharding(df, series_col, shard_threshold):
        return sharded_difference(
            df,
            cols,
            order,
            shard_rows=shard_rows,
            order_col=order_col,
            series_col=series_col,
            drop_null=drop_null,
        )
    out = df
    for _ in range(order):
        w = series_window(order_col, series_col)
        out = out.select(
            *[c for c in out.columns if c not in cols],
            *[(F.col(c) - F.lag(F.col(c), 1).over(w)).alias(c) for c in cols],
        )
        if drop_null:
            out = out.na.drop(subset=list(cols))
    # restore original column order
    return out.select(*df.columns)


def cumulative_sum(
    df: DataFrame,
    cols: Sequence[str],
    *,
    order_col: str = "ts",
    series_col: str = "series_id",
    prefix: str = "cumsum_",
) -> DataFrame:
    """Running sum per series — the undo of :func:`difference` (W4)."""
    cols = _cols_list(cols)
    w = series_window(order_col, series_col).rowsBetween(Window.unboundedPreceding, 0)
    return df.select(
        "*", *[F.sum(F.col(c)).over(w).alias(f"{prefix}{c}") for c in cols]
    )


def rolling_stats(
    df: DataFrame,
    col: str,
    window_size: int,
    *,
    stats: Sequence[str] = ("mean", "std"),
    order_col: str = "ts",
    series_col: str = "series_id",
    min_periods: bool = True,
    shard_threshold: int | None = GIANT_SERIES_ROWS,
    shard_rows: int = 1 << 20,
) -> DataFrame:
    """Trailing rolling statistics over the previous ``window_size`` rows.

    With ``min_periods`` False, rows with fewer than ``window_size``
    trailing rows get NULL (pandas ``rolling(w).mean()`` semantics).

    Adaptive (r10): giant series route to :func:`sharded_rolling_stats`
    (see :func:`supervised_lag_matrix`); ``shard_threshold=None``
    forces the global window.
    """
    if needs_sharding(df, series_col, shard_threshold):
        return sharded_rolling_stats(
            df,
            col,
            window_size,
            stats=stats,
            shard_rows=shard_rows,
            order_col=order_col,
            series_col=series_col,
            min_periods=min_periods,
        )
    w = series_window(order_col, series_col).rowsBetween(-(window_size - 1), 0)
    stat_fns = {
        "mean": F.avg,
        "std": F.stddev_samp,
        "min": F.min,
        "max": F.max,
        "sum": F.sum,
    }
    exprs = []
    cnt = F.count(F.col(col)).over(w)
    for s in stats:
        e = stat_fns[s](F.col(col)).over(w)
        if not min_periods:
            e = F.when(cnt >= window_size, e)
        exprs.append(e.alias(f"rolling_{s}_{window_size}_{col}"))
    return df.select("*", *exprs)


def sharded_lag_matrix(
    df: DataFrame,
    value_cols: Sequence[str],
    n_in: int = 1,
    *,
    shard_rows: int = 1 << 20,
    order_col: str = "ts",
    series_col: str = "series_id",
    dropnan: bool = True,
) -> DataFrame:
    """:func:`supervised_lag_matrix` (lags only) for a single giant
    series: windows run per (series, time-shard) with ``n_in`` boundary
    rows spliced in as context, so the result is identical to the
    global window while using ceil(n/shard_rows) tasks instead of 1."""
    value_cols = _cols_list(value_cols)
    from auto_ts_spark.operators.partitioning import shard_series

    sharded = shard_series(
        df,
        context_rows=n_in,
        shard_rows=shard_rows,
        order_col=order_col,
        series_col=series_col,
    )
    w = Window.partitionBy(series_col, "_shard").orderBy(F.col(order_col))
    exprs: list[Column] = [F.col(c) for c in df.columns] + [F.col("_ctx")]
    new_names: list[str] = []
    for i in range(n_in, 0, -1):
        for c in value_cols:
            name = f"{c}_lag_{i}"
            exprs.append(F.lag(F.col(c), i).over(w).alias(name))
            new_names.append(name)
    out = sharded.select(*exprs).filter(~F.col("_ctx")).drop("_ctx")
    if dropnan and new_names:
        out = out.na.drop(subset=new_names)
    return out


def sharded_rolling_stats(
    df: DataFrame,
    col: str,
    window_size: int,
    *,
    stats: Sequence[str] = ("mean", "std"),
    shard_rows: int = 1 << 20,
    order_col: str = "ts",
    series_col: str = "series_id",
    min_periods: bool = True,
) -> DataFrame:
    """:func:`rolling_stats` sharded for a single giant series
    (context = window_size - 1 boundary rows per shard)."""
    from auto_ts_spark.operators.partitioning import shard_series

    sharded = shard_series(
        df,
        context_rows=window_size - 1,
        shard_rows=shard_rows,
        order_col=order_col,
        series_col=series_col,
    )
    w = Window.partitionBy(series_col, "_shard").orderBy(
        F.col(order_col)
    ).rowsBetween(-(window_size - 1), 0)
    stat_fns = {
        "mean": F.avg,
        "std": F.stddev_samp,
        "min": F.min,
        "max": F.max,
        "sum": F.sum,
    }
    exprs = []
    cnt = F.count(F.col(col)).over(w)
    for s in stats:
        e = stat_fns[s](F.col(col)).over(w)
        if not min_periods:
            e = F.when(cnt >= window_size, e)
        exprs.append(e.alias(f"rolling_{s}_{window_size}_{col}"))
    return (
        sharded.select(*[F.col(c) for c in df.columns], F.col("_ctx"), *exprs)
        .filter(~F.col("_ctx"))
        .drop("_ctx")
    )


def sharded_difference(
    df: DataFrame,
    cols: Sequence[str],
    order: int = 1,
    *,
    shard_rows: int = 1 << 20,
    order_col: str = "ts",
    series_col: str = "series_id",
    drop_null: bool = True,
) -> DataFrame:
    """:func:`difference` sharded for a single giant series (context =
    ``order`` boundary rows; the stacked first-differences need at most
    ``order`` lookback rows)."""
    cols = _cols_list(cols)
    from auto_ts_spark.operators.partitioning import shard_series

    sharded = shard_series(
        df,
        context_rows=order,
        shard_rows=shard_rows,
        order_col=order_col,
        series_col=series_col,
    )
    out = sharded
    for _ in range(order):
        w = Window.partitionBy(series_col, "_shard").orderBy(F.col(order_col))
        out = out.select(
            *[c for c in out.columns if c not in cols],
            *[(F.col(c) - F.lag(F.col(c), 1).over(w)).alias(c) for c in cols],
        )
    out = out.filter(~F.col("_ctx"))
    if drop_null:
        out = out.na.drop(subset=list(cols))
    return out.select(*df.columns)


def drop_zero_variance(df: DataFrame, candidate_cols: Sequence[str]) -> DataFrame:
    """Drop columns whose sample stddev is 0 (one agg pass, W9)."""
    candidate_cols = _cols_list(candidate_cols)
    row = df.agg(
        *[F.stddev_samp(F.col(c)).alias(c) for c in candidate_cols]
    ).collect()[0]
    dead = [c for c in candidate_cols if row[c] is not None and row[c] == 0.0]
    return df.drop(*dead) if dead else df


def acf(
    df: DataFrame,
    col: str,
    max_lag: int,
    *,
    order_col: str = "ts",
    series_col: str = "series_id",
) -> DataFrame:
    """Autocorrelation for lags 1..max_lag as ``(lag, acf)`` rows (W17).

    One window stage to materialize all lag columns, one agg of
    ``corr(y, y_lag_k)``, then an unpivot — fully JVM-side.
    """
    w = series_window(order_col, series_col)
    lagged = df.select(
        F.col(col),
        *[F.lag(F.col(col), k).over(w).alias(f"_l{k}") for k in range(1, max_lag + 1)],
    )
    aggs = lagged.agg(
        *[F.corr(F.col(col), F.col(f"_l{k}")).alias(f"_l{k}") for k in range(1, max_lag + 1)]
    )
    stack_expr = ", ".join(f"{k}, _l{k}" for k in range(1, max_lag + 1))
    return aggs.selectExpr(f"stack({max_lag}, {stack_expr}) as (lag, acf)")


def pacf(
    df: DataFrame,
    col: str,
    max_lag: int,
    *,
    order_col: str = "ts",
    series_col: str = "series_id",
) -> "DataFrame":
    """Partial autocorrelation for lags 1..max_lag (W17,
    auto_ts/utils/eda.py:102-117).

    The heavy part — the ACF — is the distributed one-pass corr agg
    (:func:`acf`); the Durbin–Levinson recursion that turns k ACF
    values into PACF is O(k²) scalar math on a k-row result, so it
    runs on the driver (oracle-checkable: DuckDB recursive CTE).
    """
    import numpy as np

    rows = acf(df, col, max_lag, order_col=order_col, series_col=series_col).collect()
    r = np.empty(max_lag + 1)
    r[0] = 1.0
    for row in rows:
        r[row["lag"]] = row["acf"]
    phi = np.zeros((max_lag + 1, max_lag + 1))
    pacf_vals = []
    for k in range(1, max_lag + 1):
        if k == 1:
            phi[1, 1] = r[1]
        else:
            num = r[k] - sum(phi[k - 1, j] * r[k - j] for j in range(1, k))
            den = 1.0 - sum(phi[k - 1, j] * r[j] for j in range(1, k))
            phi[k, k] = num / den if den != 0 else 0.0
            for j in range(1, k):
                phi[k, j] = phi[k - 1, j] - phi[k, k] * phi[k - 1, k - j]
        pacf_vals.append((k, round(float(phi[k, k]), 6)))
    return df.sparkSession.createDataFrame(pacf_vals, "lag int, pacf double")


def seasonal_decompose(
    df: DataFrame,
    col: str,
    period: int,
    *,
    order_col: str = "ts",
    series_col: str = "series_id",
) -> DataFrame:
    """Additive seasonal decomposition (classical moving-average method,
    the deterministic core of what the reference delegates to Prophet's
    seasonality modelling): trend = centered ``period``-window mean,
    seasonal = per-phase mean of the detrended series (normalized to
    sum 0), residual = y - trend - seasonal.

    Three window/agg stages, all JVM-side; the per-phase means shuffle
    ``period`` rows per series. Output keeps every input row.
    """
    w = series_window(order_col, series_col)
    half = period // 2
    trend_w = w.rowsBetween(-half, period - 1 - half)
    cnt = F.count(F.col(col)).over(trend_w)
    trend = F.when(
        cnt == period, F.avg(F.col(col)).over(trend_w)
    )  # undefined at the edges, like statsmodels
    phase = (F.row_number().over(w) - 1) % period
    base = df.select(
        series_col,
        order_col,
        F.col(col),
        phase.alias("_phase"),
        trend.alias("trend"),
    )
    phase_means = (
        base.filter(F.col("trend").isNotNull())
        .groupBy(series_col, "_phase")
        .agg(F.avg(F.col(col) - F.col("trend")).alias("_pm"))
    )
    grand = phase_means.groupBy(series_col).agg(F.avg("_pm").alias("_gm"))
    seasonal = (
        base.join(phase_means, [series_col, "_phase"], "left")
        .join(grand, series_col, "left")
        .withColumn("seasonal", F.col("_pm") - F.col("_gm"))
    )
    return seasonal.select(
        series_col,
        order_col,
        F.col(col),
        "trend",
        "seasonal",
        (F.col(col) - F.col("trend") - F.col("seasonal")).alias("residual"),
    )
