"""Capture .explain("formatted") for headline queries into
plans/$PLANS_ROUND/ (default r14).

Usage:
    python tools/capture_plans.py before [query ...]
    python tools/capture_plans.py after  [query ...]

With no query names, captures every bench HEADLINE query. The explain
runs on the CONSTRUCTED DataFrame (queries with eager internals — GD
training loops, two-pass ranks — execute those during construction,
same as the bench does before its timed noop write).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B
import __spark_entry__ as E
from auto_ts_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(B.HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    qs = dict(
        E.queries(),
        curate_chain=B.q_curate_chain,
        curate_full=B.q_curate_full,
    )
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"plan:{name}")
        df = fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        n_ex = txt.count("Exchange")
        print(f"{name}: {len(txt)} chars, Exchange x{n_ex} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
