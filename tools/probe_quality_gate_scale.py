"""Quality-gate decade decomposition (r12, verdict task #1).

The r10/r11 curate_full probes read the in-chain quality stage at
10.8-10.9x wall per 10x docs at 5M — the only stage above 10x/decade.
But the stage's in-chain wall is NOT the operator: `tick()` wraps each
stage in `localCheckpoint(eager=True)` + `count()` so later stages
don't recompute the chain, so the reading bundles three costs:

  (a) the gate itself — one shuffle-free filter over the text column
      (`quality_keep_expr`: let-bound tokenize + metric struct),
  (b) materializing the ~whole surviving corpus into heap-resident
      checkpoint blocks (quality runs EARLY, so its survivor frame is
      the largest the chain ever checkpoints),
  (c) doing (b) while the upstream scrub stage's checkpoint blocks
      are already resident in the same 8g heap.

This probe measures each separately at 500k and 5M docs on the same
fixtures the curate_full probe uses, so the decade ratio can be
attributed: if (a) is linear and the excess lives in (b)/(c), the
reading is measurement-harness materialization + heap slack, not an
operator scale problem (in production, stage_counts=False, the gate
is a lazy fused filter and (b)/(c) never happen).

Reading note (r12 finding, BASELINE.md): denominate text-stage decade
ratios in BYTES — this fixture grows chars 10.65x per 10x docs by
design, so a byte-linear stage reads ~10.7x in docs terms.

Usage: python tools/probe_quality_gate_scale.py [n_docs ...]
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

    from probe_curate_full_scale import make_curate_documents  # noqa: E402

    from auto_ts_spark import get_spark
    from auto_ts_spark.operators.textops import quality_keep_expr

    spark = get_spark("probe_quality_gate_scale")
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
        rec: dict = {"n_docs": n}

        # (a) the operator alone: lazy filter + count, nothing retained
        t0 = time.perf_counter()
        rec["survivors"] = docs.filter(quality_keep_expr("text")).count()
        rec["filter_count_s"] = round(time.perf_counter() - t0, 1)

        # (b) the tick() shape standalone: filter -> eager
        # localCheckpoint -> count, fresh heap
        t0 = time.perf_counter()
        chk = docs.filter(quality_keep_expr("text")).localCheckpoint(eager=True)
        chk.count()
        rec["filter_checkpoint_s"] = round(time.perf_counter() - t0, 1)
        chk.unpersist()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

        # (c) the in-chain shape: the upstream stage's checkpoint is
        # already heap-resident when quality materializes its own
        up = docs.localCheckpoint(eager=True)
        up.count()
        t0 = time.perf_counter()
        chk = up.filter(quality_keep_expr("text")).localCheckpoint(eager=True)
        chk.count()
        rec["filter_checkpoint_shared_heap_s"] = round(
            time.perf_counter() - t0, 1
        )
        chk.unpersist()
        up.unpersist()
        rec["loadavg"] = [round(x, 2) for x in os.getloadavg()]
        print(json.dumps(rec), flush=True)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    spark.stop()


if __name__ == "__main__":
    main()
