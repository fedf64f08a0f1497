"""Measured experiment (VERDICT r3 #2): shuffle-regime superstep edge
LAYOUT A/B for PageRank — src-pinned (join-side, current default) vs
dst-pinned (aggregation-side, the "dual copy" candidate).

The question: in the shuffle regime (rank vector too big to broadcast),
which cached-edge partitioning makes a superstep cheaper?

  src layout: the SpMV join (edges.src = rank.id) is co-partitioned and
              exchange-free; the groupBy(dst) pays one exchange of the
              map-side PARTIAL aggregate (bounded by partitions x
              per-partition distinct dst).
  dst layout: the aggregation's clustering is pre-satisfied, but the
              join's edge side is no longer clustered on the join key,
              so Catalyst re-exchanges THE EDGES every superstep
              (edge-sized) — unless the vector broadcasts, which is
              exactly the broadcast regime where dst is already the
              default. A second cached copy cannot remove this: a
              shuffled join requires BOTH sides clustered on the join
              key, and only one key can be pre-satisfied per join+agg
              pair.

Protocol (BENCH.md "Benchmarking gotchas"): alternating variant order
across passes, best-of-K per variant, median per-superstep walls via
the metrics hook, broadcast_max_vertices=0 to force the shuffle regime.

Usage: python scripts/dual_layout_bench.py [--scale 20] [--cores 32]
       [--iters 8] [--passes 2]
Prints one JSON line; paste into BENCH.md and adopt/reject on numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=20)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    from combblas_spark.algorithms.pagerank import pagerank
    from combblas_spark.graph import build_graph
    from combblas_spark.session import get_spark
    from combblas_spark.sources.rmat import rmat_edges

    spark = get_spark(app_name="dual-layout-bench", cores=args.cores,
                      shuffle_partitions=2 * args.cores, driver_memory="20g")
    spark.sparkContext.setLogLevel("ERROR")

    path = f"/tmp/rmat{args.scale}.parquet"
    if not os.path.exists(path):
        build_graph(rmat_edges(spark, args.scale, 16)).write.parquet(path)
    edges = spark.read.parquet(path)
    nedges = edges.count()

    def run(layout: str) -> dict:
        metrics: list = []
        t0 = time.perf_counter()
        r = pagerank(edges, n_iter=args.iters, tol=None,
                     broadcast_max_vertices=0, loop_layout=layout,
                     metrics=metrics)
        chk = r.agg({"rank": "sum"}).collect()[0][0]
        wall = time.perf_counter() - t0
        times = [m["t"] for m in metrics]
        steps = [b - a for a, b in zip(times, times[1:])]
        return {"wall": round(wall, 3),
                "superstep_median": round(statistics.median(steps), 3) if steps else None,
                "rank_sum": round(float(chk), 9)}

    results = {"src": [], "dst": []}
    for p in range(args.passes):
        order = ["src", "dst"] if p % 2 == 0 else ["dst", "src"]
        for layout in order:
            results[layout].append(run(layout))

    best = {k: min(v, key=lambda r: r["wall"]) for k, v in results.items()}
    ratio = best["dst"]["wall"] / best["src"]["wall"]
    print(json.dumps({
        "experiment": "shuffle_regime_edge_layout",
        "scale": args.scale, "edges": nedges, "cores": args.cores,
        "iters": args.iters, "passes": results,
        "best": best, "dst_over_src_wall_ratio": round(ratio, 3),
        "verdict": "src (join-pinned) wins" if ratio > 1.02 else
                   ("dst (agg-pinned) wins" if ratio < 0.98 else "parity"),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
