"""html_extract decade probe (r13): the raw-web markup-extraction head
must be byte-linear like the other text stages.

Fixture: the curate-probe documents (same generator the quality-gate /
span-scrub / curate_full probes use) wrapped in a deterministic HTML
template — head with title/style/script subtrees, a comment, an
entity, and the text's newlines re-expressed as ``</p><p>`` so the
extractor has real per-line work to undo. The HTML is materialized to
parquet ONCE per size so the measured job is scan → one Arrow-batched
``html_extract`` projection → length aggregate (forces a full parse of
every document), not the synthesis.

Reading note (r12 finding, BASELINE.md): denominate text-stage decade
ratios in BYTES — this fixture's vocabulary grows with n by design.

Usage: python tools/probe_html_extract_scale.py [n_docs ...]
  default: 500000 5000000
Prints one JSON line per scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(__file__))


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [500_000, 5_000_000]
    import numpy as np
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from probe_curate_full_scale import make_curate_documents  # noqa: E402

    from auto_ts_spark import get_spark
    from auto_ts_spark.operators.markup import html_extract
    from auto_ts_spark.operators.partitioning import ensure_parallelism

    spark = get_spark("probe_html_extract_scale")
    workdir = "/root/repo/.localdata/probe_docs"
    for n in sizes:
        dpath = os.path.join(workdir, f"docs_curate_{n}")
        if not os.path.exists(os.path.join(dpath, "part0.parquet")):
            os.makedirs(dpath, exist_ok=True)
            rng = np.random.default_rng(1234)
            pq.write_table(
                make_curate_documents(rng, n, vocab_mult=max(1, n // 10_000)),
                f"{dpath}/part0.parquet",
            )
        hpath = os.path.join(workdir, f"html_{n}")
        if not os.path.exists(hpath):
            docs = spark.read.parquet(dpath)
            html = F.concat(
                F.lit(
                    "<html><head><title>Doc "
                ), F.col("doc_id").cast("string"),
                F.lit(
                    "</title><style>p{margin:0}</style>"
                    "<script>var x=1;if(x&lt;2){x=2}</script></head>"
                    "<body><!-- probe --><h1>Doc &#35;"
                ), F.col("doc_id").cast("string"),
                F.lit("</h1><p>"),
                F.regexp_replace(F.col("text"), "\n", "</p><p>"),
                F.lit("</p></body></html>"),
            )
            docs.select("doc_id", html.alias("html")).write.parquet(hpath)
        # same up-front fan-out curate() applies: a 500k-doc fixture is
        # 1-2 parquet splits, so without this the 500k point measures
        # 2 cores against 5M's ~20 and the decade ratio reads as
        # parallelism shape, not operator cost
        pages = ensure_parallelism(spark.read.parquet(hpath))
        rec: dict = {"n_docs": n}
        rec["html_bytes"] = pages.select(
            F.sum(F.length("html"))
        ).collect()[0][0]
        extracted = html_extract(pages, html_col="html", out_col="text")
        t0 = time.perf_counter()
        row = extracted.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("text")).alias("out_bytes"),
        ).collect()[0]
        rec["extract_wall_s"] = round(time.perf_counter() - t0, 1)
        rec["n_out"] = row["n"]
        rec["out_bytes"] = row["out_bytes"]
        rec["ns_per_html_byte"] = round(
            rec["extract_wall_s"] * 1e9 / max(1, rec["html_bytes"]), 1
        )
        rec["loadavg"] = [round(x, 2) for x in os.getloadavg()]
        print(json.dumps(rec), flush=True)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    spark.stop()


if __name__ == "__main__":
    main()
