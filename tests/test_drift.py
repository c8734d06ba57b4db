"""Snapshot drift detection (PSI + bucketed two-sample KS)."""

import numpy as np
import pytest

from auto_ts_spark.operators.drift import drift_profile


def _frames(spark, old_vals, new_vals):
    old = spark.createDataFrame([(float(v),) for v in old_vals], "x double")
    new = spark.createDataFrame([(float(v),) for v in new_vals], "x double")
    return old, new


def test_identical_distributions_are_stable(spark):
    rng = np.random.RandomState(0)
    a = rng.randn(3000)
    old, new = _frames(spark, a, a)  # literally the same sample
    row = drift_profile(old, new, cols=["x"]).collect()[0]
    assert row["ks"] == 0.0
    assert abs(row["psi"]) < 1e-9
    assert row["n_old"] == row["n_new"] == 3000


def test_mean_shift_is_flagged(spark):
    rng = np.random.RandomState(1)
    old, new = _frames(spark, rng.randn(3000), rng.randn(3000) + 1.5)
    row = drift_profile(old, new, cols=["x"]).collect()[0]
    # theoretical two-sample KS for a 1.5-sigma normal shift ~ 0.55
    assert 0.4 < row["ks"] < 0.7
    assert row["psi"] > 0.25  # "action needed" band


def test_same_distribution_fresh_samples_are_quiet(spark):
    rng = np.random.RandomState(2)
    old, new = _frames(spark, rng.randn(4000), rng.randn(4000))
    row = drift_profile(old, new, cols=["x"]).collect()[0]
    assert row["ks"] < 0.05
    assert row["psi"] < 0.1  # "stable" band


def test_out_of_range_new_values_land_in_edge_buckets(spark):
    # new snapshot entirely above the old max: everything in the top
    # bucket -> KS saturates at ~1
    old, new = _frames(spark, np.linspace(0, 1, 500), np.linspace(10, 11, 500))
    row = drift_profile(old, new, cols=["x"]).collect()[0]
    assert row["ks"] > 0.9


def test_nulls_excluded_and_multi_column(spark):
    old = spark.createDataFrame(
        [(1.0, 10.0), (2.0, None), (3.0, 30.0)], "a double, b double"
    )
    new = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 20.0), (None, 30.0)], "a double, b double"
    )
    rows = {r["column"]: r for r in drift_profile(old, new, cols=["a", "b"]).collect()}
    assert rows["a"]["n_old"] == 3 and rows["a"]["n_new"] == 2
    assert rows["b"]["n_old"] == 2 and rows["b"]["n_new"] == 3


def test_quantile_cuts_mode_runs(spark):
    rng = np.random.RandomState(3)
    old, new = _frames(spark, rng.exponential(1, 2000), rng.exponential(1, 2000))
    row = drift_profile(old, new, cols=["x"], cuts="quantile").collect()[0]
    assert row["psi"] < 0.1


def test_invalid_args(spark):
    old, new = _frames(spark, [1.0], [1.0])
    with pytest.raises(ValueError):
        drift_profile(old, new, cols=["x"], cuts="bogus")
    with pytest.raises(ValueError):
        drift_profile(old, new, cols=["x"], buckets=1)


def test_all_null_side_reports_instead_of_crashing(spark):
    # an all-NULL column on one side is exactly the regression drift
    # detection exists to catch — it must report, not DIVIDE_BY_ZERO
    old = spark.createDataFrame([(None,), (None,)], "x double")
    new = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    row = drift_profile(old, new, cols=["x"]).collect()[0]
    assert row["n_old"] == 0 and row["n_new"] == 2
    assert row["ks"] is None and row["psi"] is None
    # both sides empty: the column still gets its row
    row2 = drift_profile(old, old, cols=["x"]).collect()[0]
    assert row2["n_old"] == row2["n_new"] == 0
    # quantile mode with an all-NULL old side (empty cut list) runs too
    row3 = drift_profile(old, new, cols=["x"], cuts="quantile").collect()[0]
    assert row3["n_old"] == 0


def test_single_scan_per_side(spark):
    # the melt shape must scan each input once, not once per column
    df = spark.createDataFrame([(1.0, 2.0, 3.0)], "a double, b double, c double")
    plan = (
        drift_profile(df, df, cols=["a", "b", "c"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ExistingRDD") <= 3  # bounds agg + one per side


def test_categorical_shift_and_identity(spark):
    from auto_ts_spark.operators.drift import categorical_drift_profile

    old = spark.createDataFrame([("a",)] * 70 + [("b",)] * 30, "x string")
    new = spark.createDataFrame([("a",)] * 30 + [("b",)] * 70, "x string")
    row = categorical_drift_profile(old, new, cols=["x"]).collect()[0]
    assert row["tv"] == 0.4  # 0.5 * (|0.7-0.3| + |0.3-0.7|)
    assert row["psi"] > 0.25
    same = categorical_drift_profile(old, old, cols=["x"]).collect()[0]
    assert same["tv"] == 0.0 and same["psi"] == 0.0


def test_categorical_null_is_its_own_category(spark):
    from auto_ts_spark.operators.drift import categorical_drift_profile

    old = spark.createDataFrame([("a",)] * 10, "x string")
    new = spark.createDataFrame([(None,)] * 10, "x string")
    row = categorical_drift_profile(old, new, cols=["x"]).collect()[0]
    # a column going NULL is maximal drift, not ignored rows
    assert row["tv"] == 1.0
    assert row["n_old"] == row["n_new"] == 10


def test_categorical_tail_collapses_to_other(spark):
    from auto_ts_spark.operators.drift import categorical_drift_profile

    # 2 head categories + a 20-value tail; top_k=2 collapses the tail
    old = spark.createDataFrame(
        [("a",)] * 40 + [("b",)] * 40 + [(f"t{i}",) for i in range(20)], "x string"
    )
    row = categorical_drift_profile(old, old, cols=["x"], top_k=2).collect()[0]
    assert row["tv"] == 0.0 and row["n_old"] == 100
