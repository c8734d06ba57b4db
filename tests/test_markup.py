"""html_extract — the head-of-pipeline markup-extraction stage.

Pure-function semantics (skip subtrees, entities, block breaks,
whitespace, tolerance), the Spark projection (NULL handling, plan
shape), and the curate(html_input=...) composition with the C4 line
rules downstream.
"""

import pandas as pd
from pyspark.sql import functions as F

from auto_ts_spark.operators.markup import extract_html_text, html_extract


# ------------------------------------------------------- pure function


def test_skip_subtrees_dropped():
    h = (
        "<style>p{}</style><script>var a='<p>not text</p>';</script>"
        "<noscript>Enable <b>JS</b> now</noscript>"
        "<template><p>tmpl</p></template><p>kept</p>"
    )
    assert extract_html_text(h) == "kept"


def test_nested_skip_depth_and_stray_close():
    # template contains parsed markup incl. another skip element;
    # a stray </script> with no open must not flip the gate negative
    h = "</script><template><noscript>x</noscript><p>y</p></template>z"
    assert extract_html_text(h) == "z"


def test_entities_decoded_all_three_forms():
    assert (
        extract_html_text("<p>a &amp; b &#8212; c&#x3A;d</p>")
        == "a & b — c:d"
    )


def test_block_break_inline_strip_and_case():
    h = "<DIV>Phone: <B>555</B><br/>Key: 7</DIV><em>in</em><i>line</i>"
    assert extract_html_text(h) == "Phone: 555\nKey: 7\ninline"


def test_whitespace_collapse_and_empty_lines():
    h = "<p>  a \t b  </p>\n\n<p></p><p>c</p>"
    assert extract_html_text(h) == "a b\nc"


def test_malformed_markup_is_tolerated():
    # unclosed tags, bogus attributes, unknown entity — no exception
    out = extract_html_text("<p>a<unclosed foo='>'<b>b &nope; c")
    assert "a" in out and out == extract_html_text(
        "<p>a<unclosed foo='>'<b>b &nope; c"
    )


def test_comment_and_doctype_dropped():
    assert extract_html_text("<!DOCTYPE html><!-- gone --><p>x</p>") == "x"


def test_normalize_nfkc_and_control_chars():
    # U+FB01 fi ligature -> fi; U+200B (Cf) dropped; \x07 (Cc) dropped
    assert (
        extract_html_text("<p>caf\xe9​ ﬁ\x07n</p>", normalize=True)
        == "caf\xe9 fin"
    )


def test_plain_text_passthrough_and_empty():
    assert extract_html_text("no markup here") == "no markup here"
    assert extract_html_text("") == ""


# ----------------------------------------------------- Spark projection


def _fixture(spark):
    rows = [
        (1, "<h1>T</h1><p>a &amp; b</p><script>x()</script>"),
        (2, None),
        (3, "<ul><li>one</li><li>two</li></ul>"),
    ]
    return spark.createDataFrame(rows, "doc_id int, html string")


def test_html_extract_dataframe(spark):
    out = (
        html_extract(_fixture(spark), html_col="html", out_col="text")
        .orderBy("doc_id")
        .collect()
    )
    assert [r.text for r in out] == ["T\na & b", None, "one\ntwo"]
    assert [r.html is None for r in out] == [False, True, False]


def test_html_extract_drop_html_and_matches_pure_fn(spark):
    df = html_extract(_fixture(spark), drop_html=True)
    assert df.columns == ["doc_id", "text"]
    got = {r.doc_id: r.text for r in df.collect()}
    assert got[1] == extract_html_text(
        "<h1>T</h1><p>a &amp; b</p><script>x()</script>"
    )


def test_html_extract_plan_is_one_projection_no_exchange(spark):
    plan = (
        html_extract(_fixture(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan, plan


def test_html_extract_vectorized_batch_with_nulls():
    # the pandas path the Arrow batches exercise: mixed None/str
    s = pd.Series(["<p>x</p>", None, ""])
    out = s.map(
        lambda h: extract_html_text(h) if isinstance(h, str) else None
    )
    assert list(out) == ["x", None, ""]


# ------------------------------------------------------- curate(html=)


def test_curate_html_input_feeds_line_clean(spark):
    from auto_ts_spark.corpus import curate

    # three docs of raw HTML; doc 3's only line has no terminal
    # punctuation and <3 words, so C4 line rules erase it entirely
    good = (
        "<html><body><p>This sentence is long enough to survive the "
        "quality gate and it ends properly.</p>"
        "<script>dropme()</script></body></html>"
    )
    rows = [(1, good), (2, good), (3, "<p>short stub</p>")]
    df = spark.createDataFrame(rows, "doc_id int, html string")
    out, counts = curate(
        df,
        html_input="html",
        line_clean=True,
        quality=False,
        redact=False,
        dedup_exact=False,
        near_dedup=False,
        stage_counts=True,
    )
    got = {r.doc_id: r.text for r in out.collect()}
    assert counts["html_extract"] == 3
    assert 3 not in got  # its only line fails the C4 line rules
    assert "dropme" not in got[1] and got[1].endswith("properly.")
    assert "html" not in out.columns  # raw markup not carried forward
