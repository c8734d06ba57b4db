"""Connected-components scale probe: the r9 adaptive strategy under
both regimes.

- DISTRIBUTED path (forced via driver_max_edges=0): chain-heavy graphs
  are the worst case for min-label propagation — a path of length L
  needs ~L rounds without pointer jumping, O(log L) with it. The probe
  builds a mixture of long paths (diameter 2,000) and cliques at 1M /
  5M edges and records rounds + wall: rounds must stay ~flat (log) as
  edges grow 5x, each round being one edges⋈labels shuffle + the
  pointer-jump self-join.
- ADAPTIVE path (default threshold): the same 100k-edge graph through
  the union-find route, for the wall comparison that justifies the
  500k-edge cutover.

Usage: python tools/probe_cc_scale.py [n_edges ...]
  default: 1000000 5000000
Prints one JSON line per scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_graph(spark, n_edges: int):
    """Deterministic chain+clique mixture, built executor-side:
    80% of edges form 2,000-node paths (node i -> i+1 within a chain;
    ids strided so labels must travel), 20% form 50-node cliques."""
    from pyspark.sql import functions as F

    n_chain = int(n_edges * 0.8)
    chains = spark.range(n_chain).select(
        (F.col("id") + (F.col("id") / F.lit(1999)).cast("bigint")).alias("id_a"),
        (F.col("id") + (F.col("id") / F.lit(1999)).cast("bigint") + 1).alias("id_b"),
    )
    # cliques: group g has members g*50 .. g*50+49 offset past the
    # chain id space; edges (m, m+k) wrap within the group
    n_cliq = n_edges - n_chain
    base = 10 * (n_chain + n_edges)
    cliq = spark.range(n_cliq).select(
        (F.col("id") % F.lit(49) + 1).alias("_k"),
        ((F.col("id") / F.lit(49)).cast("bigint")).alias("_g"),
        (F.col("id") % F.lit(50)).alias("_m"),
    ).select(
        (F.lit(base) + F.col("_g") * 50 + F.col("_m")).alias("id_a"),
        (
            F.lit(base) + F.col("_g") * 50 + (F.col("_m") + F.col("_k")) % 50
        ).alias("id_b"),
    )
    return chains.unionByName(cliq).filter(F.col("id_a") != F.col("id_b"))


def probe(spark, n_edges: int, forced_distributed: bool) -> dict:
    from auto_ts_spark.operators.dedup import connected_components

    pairs = make_graph(spark, n_edges)
    stats: dict = {}
    t0 = time.perf_counter()
    out = connected_components(
        pairs,
        driver_max_edges=0 if forced_distributed else 500_000,
        stats=stats,
    )
    n_nodes = out.count()
    n_comp = out.select("cluster_id").distinct().count()
    wall = time.perf_counter() - t0
    return {
        "n_edges": n_edges,
        "path": "distributed" if forced_distributed else stats.get(
            "strategy", "distributed"
        ),
        "rounds": stats.get("rounds"),
        "wall_s": round(wall, 1),
        "n_nodes": n_nodes,
        "n_components": n_comp,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 5_000_000]
    from auto_ts_spark import get_spark

    spark = get_spark("probe_cc_scale")
    probe(spark, 20_000, True)  # warmup
    print(json.dumps(probe(spark, 100_000, False)), flush=True)  # adaptive
    for n in sizes:
        print(json.dumps(probe(spark, n, True)), flush=True)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    spark.stop()
