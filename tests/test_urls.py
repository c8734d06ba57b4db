"""URL extraction / domain filtering (operators/urls.py)."""

import pandas as pd
from pyspark.sql import functions as F

from auto_ts_spark.operators.urls import (
    domain_doc_counts,
    filter_blocklisted_domains,
    url_profile,
)

DOCS = [
    (0, "read https://blog.example.com/post/1 and http://example.org today"),
    (1, "mirror at https://Blog.Example.COM/post/1?x=2 (archived)"),
    (2, "no links at all here"),
    (3, None),
    (4, "bad actor https://ads.tracker.net/pixel and https://cdn.safe.io/a.js"),
    (5, "dupe links https://a.io/x https://a.io/y https://a.io/x"),
    # prose URL: the sentence-ending period must NOT join the host,
    # and an uppercase scheme must still be detected
    (6, "Visit https://example.org. Then see HTTPS://blocked.example.net today"),
]


def _df(spark):
    return spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["doc_id", "text"]).astype({"doc_id": "int64"})
    )


def test_url_profile(spark):
    prof = (
        url_profile(_df(spark)).toPandas().set_index("doc_id").sort_index()
    )
    assert prof.loc[0, "url_count"] == 2
    assert list(prof.loc[0, "domains"]) == ["blog.example.com", "example.org"]
    # host is lower-cased; trailing ')' punctuation not swallowed
    assert list(prof.loc[1, "domains"]) == ["blog.example.com"]
    assert prof.loc[2, "url_count"] == 0 and list(prof.loc[2, "domains"]) == []
    assert prof.loc[3, "url_count"] == 0
    # three URLs but one distinct domain
    assert prof.loc[5, "url_count"] == 3
    assert list(prof.loc[5, "domains"]) == ["a.io"]
    # trailing sentence period excluded from the host; uppercase
    # scheme still extracted (host lower-cased)
    assert list(prof.loc[6, "domains"]) == ["blocked.example.net", "example.org"]


def test_domain_doc_counts(spark):
    counts = {
        r["domain"]: r["n_docs"] for r in domain_doc_counts(_df(spark)).collect()
    }
    # per-doc distinct: doc 5's three a.io URLs count once
    assert counts["a.io"] == 1
    # docs 0 and 1 both cite blog.example.com
    assert counts["blog.example.com"] == 2


def test_blocklist_filters_by_host_and_registrable_domain(spark):
    df = _df(spark)
    # exact-host entry
    kept = filter_blocklisted_domains(df, ["ads.tracker.net"])
    assert sorted(r.doc_id for r in kept.select("doc_id").collect()) == [
        0, 1, 2, 3, 5, 6,
    ]
    # prose URL with trailing period and uppercase scheme still hits
    # the blocklist
    kept_prose = filter_blocklisted_domains(df, ["example.org"])
    assert 6 not in {r.doc_id for r in kept_prose.select("doc_id").collect()}
    kept_upper = filter_blocklisted_domains(df, ["example.net"])
    assert 6 not in {r.doc_id for r in kept_upper.select("doc_id").collect()}
    # registrable-domain entry catches the subdomain
    kept2 = filter_blocklisted_domains(df, ["tracker.net"])
    assert 4 not in {r.doc_id for r in kept2.select("doc_id").collect()}
    # NULL/linkless docs pass through
    assert {2, 3}.issubset({r.doc_id for r in kept2.select("doc_id").collect()})


def test_blocklist_plan_has_no_join(spark):
    plan = (
        filter_blocklisted_domains(_df(spark), ["x.com"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Exchange" not in plan
