"""URL extraction and domain-level filtering — the corpus-curation
steps the C4 / RefinedWeb / Gopher pipelines run before text quality
scoring: pull URLs out of document text, reduce them to registrable
domains, aggregate per-domain document counts, and drop documents
from blocklisted domains.

All detection is built-in ``regexp_*`` expressions (JVM codegen, no
Python, no shuffle until the per-domain aggregate), with the same
Java-regex/RE2-common syntax restriction as ``operators/pii.py`` so a
DuckDB oracle replays it verbatim.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# host label run that cannot START or END with '.' or '-', so a
# sentence-ending period after a prose URL is not swallowed into the
# host ('https://example.org.' -> host 'example.org')
_HOST = r"[A-Za-z0-9]([A-Za-z0-9.-]*[A-Za-z0-9])?"

# scheme (case-insensitive via explicit classes — Java and RE2 both
# lack a portable inline flag prefix we can share) + host + optional
# port/path; the path stops at whitespace or closing punctuation that
# commonly trails prose-embedded links
_SCHEME = r"[Hh][Tt][Tt][Pp][Ss]?://"
URL_PATTERN = _SCHEME + _HOST + r"(:\d+)?(/[^\s\"'<>)\]]*)?"

# host part alone (first group) — used to reduce a URL to its domain
HOST_PATTERN = _SCHEME + "(" + _HOST + ")"


def extract_urls(col: Column) -> Column:
    """array<string> of URLs found in the text (may repeat)."""
    return F.regexp_extract_all(col, F.lit(URL_PATTERN), F.lit(0))


def url_domain(url: Column) -> Column:
    """Lower-cased host of one URL string ('' when not a URL)."""
    return F.lower(F.regexp_extract(url, HOST_PATTERN, 1))


def registrable_domain(host: Column) -> Column:
    """Last two labels of the host (example.com for a.b.example.com) —
    the pragmatic eTLD+1 approximation public pipelines use when no
    public-suffix list is shipped; documented trade-off (co.uk-style
    suffixes group one level too high)."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(n <= 2, host).otherwise(
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    )


def url_profile(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document URL stats: ``(id, url_count, distinct domains)``."""
    urls = extract_urls(F.col(text_col))
    domains = F.array_distinct(
        F.transform(urls, lambda u: url_domain(u))
    )
    return df.select(
        F.col(id_col),
        F.coalesce(F.size(urls), F.lit(0)).cast("long").alias("url_count"),
        F.array_sort(domains).alias("domains"),
    )


def domain_doc_counts(
    df: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """(domain, n_docs) — how many documents cite each domain at least
    once; the corpus-level view a blocklist review starts from. One
    explode + one count-distinct-free aggregate (per-doc domains are
    already distinct)."""
    return (
        df.select(
            F.explode(
                F.array_distinct(
                    F.transform(
                        extract_urls(F.col(text_col)), lambda u: url_domain(u)
                    )
                )
            ).alias("domain")
        )
        .groupBy("domain")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


def filter_blocklisted_domains(
    df: DataFrame,
    blocklist: Sequence[str],
    *,
    text_col: str = "text",
) -> DataFrame:
    """Drop documents citing any blocklisted domain (exact host match
    OR registrable-domain match, so 'ads.example.com' is caught by a
    blocklist entry 'example.com'). The blocklist is a driver-side
    constant folded into the predicate — no join, no shuffle."""
    bl = F.array(*[F.lit(str(b).lower()) for b in blocklist])
    domains = F.transform(extract_urls(F.col(text_col)), lambda u: url_domain(u))
    hit = F.exists(
        domains,
        lambda d: F.array_contains(bl, d)
        | F.array_contains(bl, registrable_domain(d)),
    )
    return df.filter(~F.coalesce(hit, F.lit(False)))
