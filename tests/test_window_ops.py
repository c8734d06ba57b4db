"""Window-operator unit tests: parity with pandas semantics
(the reference's computational substrate) on small frames."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from auto_ts_spark.functions.calendar import add_calendar_features
from auto_ts_spark.operators import folds, lags


@pytest.fixture(scope="module")
def small_series(spark):
    ts = pd.date_range("2020-01-01", periods=30, freq="D")
    rng = np.random.RandomState(0)
    pdf = pd.DataFrame(
        {"series_id": "0", "ts": ts, "value": rng.randn(30).round(6)}
    )
    return spark.createDataFrame(pdf), pdf


def test_lag_matrix_matches_pandas_shift(small_series):
    sdf, pdf = small_series
    out = (
        lags.supervised_lag_matrix(sdf, ["value"], n_in=2)
        .orderBy("ts")
        .toPandas()
    )
    expected = pdf.copy()
    expected["value_lag_1"] = expected["value"].shift(1)
    expected["value_lag_2"] = expected["value"].shift(2)
    expected = expected.dropna().reset_index(drop=True)
    assert np.allclose(out["value_lag_1"], expected["value_lag_1"])
    assert np.allclose(out["value_lag_2"], expected["value_lag_2"])
    assert len(out) == 28


def test_difference_matches_pandas_diff(small_series):
    sdf, pdf = small_series
    out = lags.difference(sdf, ["value"], order=1).orderBy("ts").toPandas()
    expected = pdf["value"].diff().dropna()
    assert np.allclose(out["value"], expected)


def test_cumsum_matches_pandas(small_series):
    sdf, pdf = small_series
    out = lags.cumulative_sum(sdf, ["value"]).orderBy("ts").toPandas()
    assert np.allclose(out["cumsum_value"], pdf["value"].cumsum())


def test_rolling_matches_pandas(small_series):
    sdf, pdf = small_series
    out = lags.rolling_stats(sdf, "value", 4).orderBy("ts").toPandas()
    exp_mean = pdf["value"].rolling(4, min_periods=1).mean()
    exp_std = pdf["value"].rolling(4, min_periods=2).std()
    assert np.allclose(out["rolling_mean_4_value"], exp_mean)
    got_std = out["rolling_std_4_value"].to_numpy()
    assert np.isnan(got_std[0]) and np.allclose(got_std[1:], exp_std[1:])


def test_rolling_strict_window_nulls(small_series):
    sdf, _ = small_series
    out = (
        lags.rolling_stats(sdf, "value", 4, min_periods=False)
        .orderBy("ts")
        .toPandas()
    )
    assert out["rolling_mean_4_value"].isna().sum() == 3  # first 3 rows null


def test_acf_matches_numpy(small_series):
    sdf, pdf = small_series
    out = lags.acf(sdf, "value", 3).toPandas().set_index("lag")["acf"]
    for k in (1, 2, 3):
        expected = pdf["value"].autocorr(k)  # pandas Pearson-corr autocorr
        assert abs(out[k] - expected) < 1e-9


def test_calendar_dow_matches_pandas(spark):
    ts = pd.date_range("2021-06-01", periods=120, freq="7h")
    sdf = spark.createDataFrame(pd.DataFrame({"ts": ts}))
    out = add_calendar_features(sdf).orderBy("ts").toPandas()
    assert (out["ts_dayofweek"].to_numpy() == ts.dayofweek.to_numpy()).all()
    assert (out["ts_weekofyear"].to_numpy() == ts.isocalendar().week.to_numpy()).all()
    assert (out["ts_hour"].to_numpy() == ts.hour.to_numpy()).all()
    weekend = (ts.dayofweek >= 5).astype(int)
    assert (out["ts_weekend"].to_numpy() == np.asarray(weekend)).all()


def test_expanding_folds_sklearn_parity(spark):
    """Fold membership must equal sklearn TimeSeriesSplit(n, test_size)."""
    n, n_splits, test_size = 40, 3, 5
    pdf = pd.DataFrame(
        {"series_id": "0", "ts": pd.date_range("2020-01-01", periods=n, freq="D")}
    )
    out = (
        folds.expanding_folds(spark.createDataFrame(pdf), n_splits, test_size)
        .orderBy("fold", "rn")
        .toPandas()
    )
    for i in range(n_splits):
        train_end = n - (n_splits - i) * test_size
        f = out[out["fold"] == i]
        assert f[f["role"] == "train"]["rn"].max() == train_end
        assert list(f[f["role"] == "test"]["rn"]) == list(
            range(train_end + 1, train_end + test_size + 1)
        )


def test_sliding_folds_short_series_no_negative_folds(spark):
    pdf = pd.DataFrame(
        {"series_id": "0", "ts": pd.date_range("2020-01-01", periods=10, freq="D")}
    )
    out = folds.sliding_folds(
        spark.createDataFrame(pdf), initial=100, horizon=10, period=10
    )
    assert out.count() == 0


def test_forward_fill(spark):
    from auto_ts_spark.operators.future import forward_fill

    pdf = pd.DataFrame(
        {
            "series_id": "0",
            "ts": pd.date_range("2020-01-01", periods=6, freq="D"),
            "v": [1.0, None, None, 4.0, None, 6.0],
        }
    )
    out = forward_fill(spark.createDataFrame(pdf), ["v"]).orderBy("ts").toPandas()
    assert list(out["v"]) == [1.0, 1.0, 1.0, 4.0, 4.0, 6.0]
    assert list(out["v_missing_flag"]) == [0, 1, 1, 0, 1, 0]


def test_future_index_monthly(spark):
    from auto_ts_spark.operators.future import future_index

    pdf = pd.DataFrame(
        {
            "series_id": "0",
            "ts": pd.date_range("2020-01-31", periods=3, freq="ME"),
        }
    )
    out = (
        future_index(spark.createDataFrame(pdf), 4, "months")
        .orderBy("ts")
        .toPandas()
    )
    assert len(out) == 4
    assert out["ts"].iloc[0] > pdf["ts"].iloc[-1]


def test_pacf_ar1_signature(spark):
    """PACF of an AR(1) process: pacf(1) near phi, pacf(k>1) near 0 —
    the defining property Durbin-Levinson must reproduce."""
    import numpy as np
    import pandas as pd

    from auto_ts_spark.operators.lags import pacf

    rng = np.random.RandomState(7)
    n, phi = 400, 0.7
    y = np.zeros(n)
    for i in range(1, n):
        y[i] = phi * y[i - 1] + rng.randn()
    pdf = pd.DataFrame(
        {
            "series_id": "0",
            "ts": pd.date_range("2024-01-01", periods=n, freq="D"),
            "y": y,
        }
    )
    out = pacf(spark.createDataFrame(pdf), "y", 5).toPandas().set_index("lag")
    assert abs(out.loc[1, "pacf"] - phi) < 0.12
    assert (out.loc[2:, "pacf"].abs() < 0.15).all()


def test_salted_join_equals_plain_join(spark):
    """Skew salting must not change the result set (order-insensitive)."""
    import pandas as pd

    from auto_ts_spark.io.sources import load_table
    from auto_ts_spark.operators.partitioning import salted_join

    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    c = load_table(spark, "/root/testdata/sf0.001", "customer").select(
        "c_custkey", "c_name"
    )
    plain = o.join(c, o.o_custkey == c.c_custkey).select("o_orderkey", "c_name")
    salted = salted_join(
        o.withColumnRenamed("o_custkey", "k"),
        c.withColumnRenamed("c_custkey", "k"),
        "k",
        n_salts=4,
    ).select("o_orderkey", "c_name")
    a = plain.toPandas().sort_values(["o_orderkey", "c_name"]).reset_index(drop=True)
    b = salted.toPandas().sort_values(["o_orderkey", "c_name"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_lag_ops_do_not_leak_across_series(spark):
    """The scale design hangs on per-series window partitioning: lags,
    diffs, and rolling stats must never read a neighboring series."""
    import pandas as pd

    from auto_ts_spark.operators.lags import difference, rolling_stats, supervised_lag_matrix

    pdf = pd.concat(
        [
            pd.DataFrame(
                {
                    "series_id": sid,
                    "ts": pd.date_range("2024-01-01", periods=10, freq="D"),
                    "y": [base + i for i in range(10)],
                }
            )
            for sid, base in [("a", 0.0), ("b", 1000.0)]
        ]
    )
    df = spark.createDataFrame(pdf)

    lagged = supervised_lag_matrix(df, ["y"], n_in=2).toPandas()
    for sid, base in [("a", 0.0), ("b", 1000.0)]:
        part = lagged[lagged.series_id == sid].sort_values("ts")
        # first rows with full lags start at t=2; lag values stay in-series
        assert part["y_lag_1"].between(base, base + 9).all()
        assert part["y_lag_2"].between(base, base + 9).all()
        assert len(part) == 8  # 2 boundary rows dropped per series, not globally

    diffed = difference(df, ["y"]).toPandas()
    assert len(diffed) == 18  # one boundary row per series
    assert (diffed["y"] == 1.0).all()  # never the 991 cross-series jump

    rolled = rolling_stats(df, "y", window_size=3, stats=("mean",)).toPandas()
    b0 = rolled[(rolled.series_id == "b")].sort_values("ts").iloc[2]
    assert b0["rolling_mean_3_y"] == 1001.0  # windows restart per series


def test_seasonal_decompose_multi_series(spark):
    """Recovers a planted weekly pattern per series; with real (non-
    literal) series keys the grand-mean join plans as a hash join, not
    the NLJ the single-series fixture degenerates to."""
    import numpy as np
    import pandas as pd

    from auto_ts_spark.operators.lags import seasonal_decompose

    seasonal = [5.0, -3.0, 1.0, 0.0, 2.0, -4.0, -1.0]  # sums to 0
    frames = []
    for sid, level in [("a", 100.0), ("b", 500.0)]:
        n = 70
        y = [level + 0.5 * t + seasonal[t % 7] for t in range(n)]
        frames.append(
            pd.DataFrame(
                {"series_id": sid, "ts": pd.date_range("2024-01-01", periods=n, freq="D"), "y": y}
            )
        )
    df = spark.createDataFrame(pd.concat(frames))
    out = seasonal_decompose(df, "y", 7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    pdf = out.toPandas()
    mid = pdf[pdf["trend"].notna()]
    assert np.allclose(mid["residual"], 0.0, atol=1e-6)  # exact linear trend + seasonal
    for sid in ["a", "b"]:
        got = (
            mid[mid.series_id == sid]
            .assign(phase=lambda d: (d["ts"] - d["ts"].min()).dt.days % 7)
            .groupby("phase")["seasonal"]
            .first()
        )
        # planted pattern recovered per series (phase offset by the 3
        # trend-edge rows is absorbed because pattern is position-locked)
        assert np.allclose(sorted(got), sorted(seasonal), atol=1e-6)


def test_resample_regular_gap_fill(spark):
    """Irregular observations -> exact hourly grid; gaps forward-fill;
    bucket averages; per-series bounds respected."""
    import pandas as pd

    from auto_ts_spark.operators.future import resample_regular

    pdf = pd.DataFrame(
        {
            "series_id": ["a"] * 3 + ["b"] * 2,
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:05",
                    "2024-01-01 00:20",
                    "2024-01-01 03:40",
                    "2024-01-02 10:00",
                    "2024-01-02 12:30",
                ]
            ),
            "y": [1.0, 3.0, 9.0, 5.0, 7.0],
        }
    )
    out = (
        resample_regular(spark.createDataFrame(pdf), ["y"], 3600)
        .orderBy("series_id", "ts")
        .toPandas()
    )
    a = out[out.series_id == "a"]
    assert list(a["y"]) == [2.0, 2.0, 2.0, 9.0]  # avg bucket, 2 ffilled gaps
    assert a["ts"].iloc[0] == pd.Timestamp("2024-01-01 00:00")
    b = out[out.series_id == "b"]
    assert len(b) == 3 and list(b["y"]) == [5.0, 5.0, 7.0]  # own bounds
