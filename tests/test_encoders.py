"""M12 encoder semantics: NaN-safe, unseen-safe, invertible (reference
my_encoders.py contract)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from auto_ts_spark.operators.encoders import (
    LabelEncoder,
    build_feature_pipeline,
    label_encode,
)


@pytest.fixture(scope="module")
def frames(spark):
    train = spark.createDataFrame(
        [("b",), ("a",), ("c",), (None,), ("a",)], "cat string"
    )
    test = spark.createDataFrame(
        [("a",), ("z",), (None,), ("q",)], "cat string"
    )
    return train, test


def test_codes_deterministic_sorted(spark, frames):
    train, _ = frames
    enc = LabelEncoder("cat").fit(train)
    m = {r["value"]: r["code"] for r in enc.mapping.collect()}
    # sorted-value order: NULL sentinel \x00 sorts first, then a, b, c
    assert m["a"] == 1 and m["b"] == 2 and m["c"] == 3


def test_null_gets_own_code_and_unseen_get_own_codes(spark, frames):
    train, test = frames
    enc = LabelEncoder("cat").fit(train)
    out = enc.transform(test).toPandas().set_index("cat", drop=False)
    assert out.loc["a", "cat_code"] == 1
    # null -> its own (sentinel) code, not dropped
    null_codes = out[out["cat"].isna()]["cat_code"]
    assert len(null_codes) == 1 and null_codes.iloc[0] == 0
    # each unseen value gets its OWN code past max_code, sorted among
    # the unseen (reference my_encoders.py:81-95 grows the dict) —
    # q < z so q=4, z=5
    assert out.loc["q", "cat_code"] == 4 and out.loc["z", "cat_code"] == 5


def test_unseen_codes_are_invertible(spark, frames):
    train, test = frames
    enc = LabelEncoder("cat").fit(train)
    coded = enc.transform(test)
    back = enc.inverse_transform(coded).toPandas()
    assert (back["cat"].fillna("∅") == back["cat_code_value"].fillna("∅")).all()


def test_fit_has_no_single_partition_exchange(spark, frames):
    """Scale contract (round-2 verdict scale-weak #1): the mapping's
    rank must never plan an un-partitioned window (Exchange
    SinglePartition funnels every distinct value through one task)."""
    train, _ = frames
    enc = LabelEncoder("cat").fit(train)
    plan = enc.mapping._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_distributed_rank_matches_global_sort(spark):
    """Two-pass rank ≡ global sorted enumeration, across partition
    counts and value skew."""
    import random

    from auto_ts_spark.operators.encoders import distributed_rank

    random.seed(13)
    vals = [f"v{random.randrange(10**6):06d}" for _ in range(5000)]
    uniq = sorted(set(vals))
    df = spark.createDataFrame([(v,) for v in vals], "value string").distinct()
    got = {r["value"]: r["code"] for r in distributed_rank(df, "value").collect()}
    assert got == {v: i for i, v in enumerate(uniq)}


def test_inverse_round_trip(spark, frames):
    train, _ = frames
    enc = LabelEncoder("cat").fit(train)
    coded = enc.transform(train)
    back = enc.inverse_transform(coded).toPandas()
    assert (back["cat"].fillna("∅") == back["cat_code_value"].fillna("∅")).all()


def test_one_shot_label_encode_train_test(spark, frames):
    train, test = frames
    out = label_encode(test, "cat", train_df=train).toPandas()
    assert set(out.columns) == {"cat", "cat_code"}


def test_feature_pipeline_shapes(spark):
    df = spark.createDataFrame(
        [("x", 1.0), ("y", None), ("x", 3.0), (None, 4.0)],
        "cat string, num double",
    )
    pipe = build_feature_pipeline(["cat"], ["num"])
    model = pipe.fit(df)
    out = model.transform(df)
    vecs = [r["features"] for r in out.collect()]
    # 3 OHE slots (x, y, unseen/null bucket) + 1 numeric
    assert all(v.size == 4 for v in vecs)
    # MaxAbs keeps values in [-1, 1]
    assert all(abs(x) <= 1.0 for v in vecs for x in v.toArray())
    # null numeric median-imputed: no NaNs anywhere
    import math

    assert not any(math.isnan(x) for v in vecs for x in v.toArray())
