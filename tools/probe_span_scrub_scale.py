"""Cross-doc repeated-span scrub decade probe (r10).

Measures `scrub_repeated_spans` standalone (apply mode, noop sink) at
500k and 5M docs over the curate-probe fixtures. Exists because the
r10 curate_full decade probe caught the operator going 27x for 10x
docs; the fix (min/max dup criterion replacing the Expand+two-shuffle
count_distinct plan, xxhash64-over-slice fingerprint replacing
md5+conv string building, shuffle-hash spans-dup join replacing the
240M-row sort) brought the standalone ratio to ~11.7x for 10x — the
remaining slack is 8g-heap shuffle spill, measured here so future
rounds can watch it.

Usage: python tools/probe_span_scrub_scale.py [n_docs ...]
  default: 500000 5000000  (fixtures are built by
  tools/probe_curate_full_scale.py and reused from .localdata)
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
    from probe_curate_full_scale import make_curate_documents  # noqa: E402

    import numpy as np
    import pyarrow.parquet as pq

    from auto_ts_spark import get_spark
    from auto_ts_spark.operators import textops as TOPS

    spark = get_spark("probe_span_scrub_scale")
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
        docs = spark.read.parquet(dpath)
        t0 = time.perf_counter()
        out = TOPS.scrub_repeated_spans(docs, window=8, mode="apply")
        out.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "n_docs": n,
                    "wall_s": round(wall, 1),
                    "loadavg": [round(x, 2) for x in os.getloadavg()],
                }
            ),
            flush=True,
        )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
