"""PII detection/redaction (operators/pii.py): planted examples per
category, redaction order, NULL handling, and plan hygiene."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from auto_ts_spark.operators.pii import pii_profile, redact_documents

DOCS = [
    (0, "mail me at jane.doe+spam@mail.example.co.uk today"),
    (1, "call (555) 123-4567 or 555 987 6543"),
    (2, "card 4242 4242-4242 4242 and 1111-2222-3333-4444"),
    (3, "ssn 123-45-6789 leaked"),
    (4, "server 192.168.001.1 and 10.0.0.255 up"),
    (5, "clean text with numbers 123456789 and date 2024-01-02"),
    (6, None),
    (7, "a@b.io pinged 8.8.8.8; reach 555-111-2222, SSN 999-88-7777"),
    # the most common real-world leak forms: contiguous card digits,
    # dot-separated and contiguous phone numbers
    (8, "card 4242424242424242 phone 555.123.4567 cell 5551234567"),
]


@pytest.fixture(scope="module")
def profiled(spark):
    df = spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["doc_id", "text"]).astype({"doc_id": "int64"})
    )
    out = pii_profile(df, text_col="text", id_col="doc_id").toPandas()
    return out.set_index("doc_id").sort_index()


def test_category_counts(profiled):
    assert profiled.loc[0, "email_count"] == 1
    assert profiled.loc[1, "phone_count"] == 2
    # '4242 4242-4242 4242' mixes separators — still one CC match
    assert profiled.loc[2, "credit_card_count"] == 2
    assert profiled.loc[3, "ssn_count"] == 1
    assert profiled.loc[4, "ipv4_count"] == 2
    row7 = profiled.loc[7]
    assert (
        row7["email_count"],
        row7["ipv4_count"],
        row7["phone_count"],
        row7["ssn_count"],
    ) == (1, 1, 1, 1)
    assert row7["pii_total"] == 4
    row8 = profiled.loc[8]
    assert row8["credit_card_count"] == 1
    assert row8["phone_count"] == 2
    assert (
        profiled.loc[8, "redacted"]
        == "card <CREDIT_CARD> phone <PHONE> cell <PHONE>"
    )


def test_clean_text_untouched(profiled):
    row = profiled.loc[5]
    assert row["pii_total"] == 0
    # a bare digit run or an ISO date is NOT phone/SSN/CC
    assert row["redacted"] == DOCS[5][1]


def test_null_text(profiled):
    row = profiled.loc[6]
    assert row["pii_total"] == 0
    assert row["redacted"] is None or pd.isna(row["redacted"])


def test_redaction_tokens(profiled):
    assert profiled.loc[0, "redacted"] == "mail me at <EMAIL> today"
    assert profiled.loc[3, "redacted"] == "ssn <SSN> leaked"
    assert profiled.loc[4, "redacted"] == "server <IP> and <IP> up"
    assert (
        profiled.loc[7, "redacted"]
        == "<EMAIL> pinged <IP>; reach <PHONE>, SSN <SSN>"
    )


def test_redact_documents_keeps_schema(spark):
    df = spark.createDataFrame(
        pd.DataFrame(DOCS[:2], columns=["doc_id", "text"]).astype(
            {"doc_id": "int64"}
        )
    )
    out = redact_documents(df)
    assert out.columns == df.columns
    assert out.filter(F.col("text").contains("<PHONE>")).count() == 1


def test_plan_is_single_stage(spark):
    """The scrub must stay a shuffle-free codegen projection — no
    Exchange anywhere (linear at any corpus size)."""
    df = spark.createDataFrame(
        pd.DataFrame(DOCS[:2], columns=["doc_id", "text"]).astype(
            {"doc_id": "int64"}
        )
    )
    plan = pii_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
