"""Head-of-pipeline HTML/markup extraction.

Every published corpus recipe this engine's curation chain implements
(C4 §2.2 line rules, RefinedWeb §3.1, CCNet, Dolma) starts from raw
web HTML, while ``corpus.curate()`` historically assumed a clean
``text`` column. ``html_extract`` closes that gap: raw HTML in, the
newline-separated visible text out, shaped so ``c4_line_clean`` /
``text_profile`` compose directly on the result.

Scope note: the reference engine (AutoViML/Auto_TS) has no text
operators at all — this is extension-brief surface, not reference
parity (see SURVEY.md §2, LLM-data-pipeline extension table).

Semantics (deliberately small and deterministic — an extractor, not a
browser):

- ``<script>``, ``<style>``, ``<noscript>``, ``<template>`` subtrees
  are dropped entirely (script/style are CDATA-content elements;
  noscript/template contain parsed markup, so a nesting depth counter
  guards them).
- Comments, doctypes and processing instructions produce nothing.
- Block-level elements (``p div li h1-h6 tr td …`` — the ``_BLOCK``
  set below) emit line breaks on open AND close; ``<br>``/``<hr>``
  break lines; inline tags (``b a em span …``) are stripped without
  introducing a separator.
- Character/entity references are decoded (named, decimal ``&#8212;``
  and hex ``&#x3A;`` forms) via the parser's ``convert_charrefs``.
- Whitespace: runs of spaces/tabs collapse to one space, lines are
  stripped, empty lines are dropped. Source newlines inside text are
  treated as line breaks — the C4 convention (its line rules operate
  on extractor-emitted lines, C4 §2.2).
- Malformed markup never raises: ``html.parser`` is tolerant by
  design (unclosed tags, stray ``</...>``, bad entities pass through).

Execution shape / 100 TB notes: the Spark operator is ONE projection
— a vectorized Arrow-batched ``pandas_udf`` column expression, so the
physical plan is a single ``ArrowEvalPython`` stage with ZERO
Exchange (pinned by ``tests/test_plan_hygiene.py``). Parsing is
inherently per-document sequential work; state is bounded by the
single document being parsed, cost is linear in input bytes, and the
stage scales embarrassingly with partitions like the other text
stages. Stdlib only (``html.parser``, ``unicodedata``).
"""

from __future__ import annotations

import unicodedata
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Elements whose entire subtree is invisible text-wise. script/style
# switch html.parser into CDATA mode (content arrives as one raw data
# blob — still gated by the depth counter); noscript/template contain
# parsed markup, which is why this is a depth counter and not a flag.
_SKIP_SUBTREE = frozenset({"script", "style", "noscript", "template"})

# Elements that establish line structure. Both the open and the close
# tag emit a break; the final whitespace pass collapses the resulting
# empty lines, so over-emitting here is harmless and keeps the rule
# uniform (no per-tag open/close special cases).
_BLOCK = frozenset({
    "html", "head", "body", "title",
    "address", "article", "aside", "blockquote", "br", "caption",
    "dd", "details", "div", "dl", "dt", "fieldset", "figcaption",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
    "header", "hr", "li", "main", "nav", "ol", "option", "p", "pre",
    "section", "summary", "table", "tbody", "td", "tfoot", "th",
    "thead", "tr", "ul",
})


class _TextExtractor(HTMLParser):
    """Streaming visible-text collector; one instance per document."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self._parts: list[str] = []

    # html.parser lowercases tag names, so <B>/<SCRIPT> match too.
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_SUBTREE:
            self._skip += 1
        elif not self._skip and tag in _BLOCK:
            self._parts.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_SUBTREE:
            # max() tolerates a stray </script> with no open
            self._skip = max(0, self._skip - 1)
        elif not self._skip and tag in _BLOCK:
            self._parts.append("\n")

    # <br/> / <script src=x/> route through startendtag, whose default
    # implementation calls starttag+endtag — net skip depth 0, two
    # (collapsed) breaks for void block tags. Inherited behavior is
    # exactly right; no override needed.

    def handle_data(self, data: str) -> None:
        if not self._skip and data:
            self._parts.append(data)

    def text(self) -> str:
        return "".join(self._parts)


def extract_html_text(html: str, *, normalize: bool = False) -> str:
    """Extract visible text from one HTML document (pure function —
    the unit the Spark operator vectorizes over).

    ``normalize``: additionally apply NFKC and drop control/format
    characters (Unicode Cc/Cf) other than the line breaks themselves
    — the optional normalization pass CCNet applies before language
    ID."""
    p = _TextExtractor()
    p.feed(html)
    p.close()
    raw = p.text()
    if normalize:
        raw = unicodedata.normalize("NFKC", raw)
        raw = "".join(
            ch
            for ch in raw
            if ch == "\n" or unicodedata.category(ch) not in ("Cc", "Cf")
        )
    lines = (" ".join(ln.split()) for ln in raw.split("\n"))
    return "\n".join(ln for ln in lines if ln)


def html_extract(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "text",
    *,
    normalize: bool = False,
    drop_html: bool = False,
) -> DataFrame:
    """Markup-extraction stage: adds ``out_col`` with the visible text
    of ``html_col`` (see module docstring for the exact semantics).

    One Arrow-batched projection, zero shuffle; NULL html stays NULL.
    ``drop_html=True`` drops the raw column afterwards so downstream
    stages (and shuffles, if any follow) never carry the markup bytes
    — at corpus scale the raw HTML is ~5-10× the visible text."""
    @F.pandas_udf("string")
    def _extract(s: pd.Series) -> pd.Series:
        return s.map(
            lambda h: extract_html_text(h, normalize=normalize)
            if isinstance(h, str)
            else None
        )

    out = df.withColumn(out_col, _extract(F.col(html_col)))
    if drop_html and html_col != out_col:
        out = out.drop(html_col)
    return out
