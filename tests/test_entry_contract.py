"""Driver-contract tests: entry() smoke + full oracle parity at the
configured sf dir (default sf0.001 for speed; the driver's own t2 run
uses sf0.01 — run PARITY_SF_DIR=/root/testdata/sf0.01 locally before
shipping query changes)."""

import pytest

import __spark_entry__ as E
from tests.parity import run_parity


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {"model", "fold", "rmse", "n_test"} <= set(df.columns)


def test_contract_shapes():
    qs, osql = E.queries(), E.oracle_sql()
    assert len(qs) >= 30
    assert set(osql) <= set(qs), "oracle entries without a query"
    # every oracle-less query is one of the documented non-SQL ops
    rows_only = set(qs) - set(osql)
    assert rows_only == {
        "adf_stationarity",
        "automl_leaderboard",
        "automl_forecast",
        "lsh_ann_topk",
        "ivf_ann_topk",
        "feature_importance",
    }


@pytest.mark.parametrize("name", sorted(E.queries()))
def test_query_parity(spark, sf_dir, name):
    res = run_parity(spark, sf_dir, [name])
    assert res[name] == [], f"{name}: {res[name]}"
