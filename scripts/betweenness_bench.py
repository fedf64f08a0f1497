"""A/B the betweenness dual-layout trade (algorithms/betweenness.py).

The backward (dependency) pass joins the edge table on dst while the
forward cache is src-partitioned; past the broadcast threshold every
backward level re-exchanges the edges. dual_layout=True pre-pays ONE
extra edge shuffle + 2x cache to make those joins exchange-free — the
same space-for-shuffle trade as hits(dual_layout) (BENCH.md §9).

Usage: python scripts/betweenness_bench.py [--scale 16] [--roots 64]
Prints one JSON line with both walls, the speedup, and an equality
check of the two result sets (placement must never change values).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=16)
    ap.add_argument("--edgefactor", type=int, default=8)
    ap.add_argument("--roots", type=int, default=64)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from combblas_spark.algorithms.betweenness import betweenness_centrality
    from combblas_spark.graph import build_graph
    from combblas_spark.session import get_spark
    from combblas_spark.sources.rmat import rmat_edges

    spark = get_spark(app_name="bc-dual-bench", cores=args.cores,
                      shuffle_partitions=args.cores)
    g = build_graph(rmat_edges(spark, args.scale, args.edgefactor)).persist()
    m = g.count()
    roots = [r["id"] for r in
             g.select(F.col("src").alias("id")).distinct()
             .orderBy(F.xxhash64("id", F.lit(7))).limit(args.roots).collect()]

    # best-of-2 per variant, alternating order, so JIT warmup and host
    # bursts don't pick the winner (BENCH.md median-of-walls methodology)
    walls, sums = {"dual": [], "single": []}, {}
    for dual in (False, True, False, True):
        key = "dual" if dual else "single"
        t0 = time.perf_counter()
        bc = betweenness_centrality(g, roots=roots, dual_layout=dual)
        s = bc.agg(F.sum("bc").alias("s")).collect()[0]["s"]
        walls[key].append(round(time.perf_counter() - t0, 2))
        sums[key] = s
    walls = {k: min(v) for k, v in walls.items()}
    print(json.dumps({
        "scale": args.scale, "edges": m, "roots": args.roots,
        "cores": args.cores, "wall_dual_s": walls["dual"],
        "wall_single_s": walls["single"],
        "speedup": round(walls["single"] / walls["dual"], 3),
        "bc_sum_equal": abs(sums["dual"] - sums["single"]) < 1e-6,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
