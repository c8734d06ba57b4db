"""PII detection / redaction over a text column — a first-class
operation in large-scale training-data pipelines (the C4 / Dolma /
RefinedWeb family of corpus-preparation steps scrub emails, phone
numbers, and IP addresses before training).

Everything here is built-in JVM expressions (``regexp_extract_all`` /
``regexp_replace``) — a linear per-row map with no shuffle and no
Python in the hot path, so the plan is a single WholeStageCodegen
projection that scales to a 100 TB corpus by partition count alone.

The patterns are deliberately restricted to syntax that means the
same thing in Java regex (Spark) and RE2 (DuckDB oracle): character
classes, bounded repetition, alternation, and ASCII ``\\b`` word
boundaries — no backreferences, no lookaround. Detection recall is
the standard pattern-based trade-off (obfuscated PII like
"john at example dot com" is out of scope, as in the public
pipelines this mirrors).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement token) — applied IN ORDER, so earlier
# redactions cannot be re-matched by later, looser patterns (email
# before phone keeps digit-bearing local parts out of the phone scan;
# credit-card before phone so a 16-digit group isn't half-eaten).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # separated (4x4 groups) OR contiguous 16-digit card numbers —
    # the contiguous form is the most common real-world leak
    (
        "credit_card",
        r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b|\b\d{16}\b",
        "<CREDIT_CARD>",
    ),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # (555) 123-4567 | 555-123-4567 | 555.123.4567 | 555 123 4567 |
    # contiguous 5551234567 — the 10-digit-run alternate deliberately
    # over-matches (any 10-digit id redacts); that is the standard
    # aggressive scrub trade-off and the reason CC (16 digits) runs
    # first
    (
        "phone",
        r"(\(\d{3}\) ?|\b\d{3}[-. ])\d{3}[-. ]\d{4}\b|\b\d{10}\b",
        "<PHONE>",
    ),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_count(col: Column, pattern: str) -> Column:
    """Occurrence count of one pattern; NULL text counts 0."""
    return F.coalesce(
        F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))), F.lit(0)
    ).cast("long")


def redact_pii(col: Column) -> Column:
    """Replace every PII match with its category token, in the fixed
    ``PII_PATTERNS`` order. NULL text stays NULL."""
    out = col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_profile(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII counts + redacted text.

    Output: ``(id_col, <name>_count per category, pii_total,
    redacted)``. Counts are computed on the ORIGINAL text — each
    category is an independent scan (grep-per-category semantics), so
    a span matching two categories (an email whose local part is a
    phone number) counts in both and ``pii_total`` can exceed the
    number of tokens in ``redacted``, where the ordered cascade
    redacts each span exactly once."""
    t = F.col(text_col)
    counts = {name: pii_count(t, pattern) for name, pattern, _ in PII_PATTERNS}
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        *[c.alias(f"{name}_count") for name, c in counts.items()],
        total.alias("pii_total"),
        redact_pii(t).alias("redacted"),
    )


def redact_documents(
    df: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """The corpus-scrub form: same frame with ``text_col`` replaced by
    its redacted version — the shape a cleaning pipeline chains before
    dedup/quality stages."""
    return df.withColumn(text_col, redact_pii(F.col(text_col)))


def pii_oracle_sql_exprs() -> tuple[str, str]:
    """(count-columns SQL, redacted-expression SQL) for the DuckDB
    oracle — generated from the SAME pattern table so the two engines
    cannot drift. DuckDB needs the 'g' flag for global replace."""
    # DuckDB single-quoted literals pass backslashes through verbatim,
    # so the Java/RE2-common patterns embed unescaped
    count_cols = ", ".join(
        f"coalesce(len(regexp_extract_all(txt, '{pattern}')), 0)::bigint"
        f" AS {name}_count"
        for name, pattern, _ in PII_PATTERNS
    )
    redacted = "txt"
    for _, pattern, token in PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, '{pattern}', '{token}', 'g')"
    total = " + ".join(
        f"coalesce(len(regexp_extract_all(txt, '{pattern}')), 0)::bigint"
        for _, pattern, _ in PII_PATTERNS
    )
    return count_cols + f", {total} AS pii_total", redacted
