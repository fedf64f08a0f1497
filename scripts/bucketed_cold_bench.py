"""Cold-start PageRank: plain parquet vs bucketed edge table.

Measures what write_bucketed_edges (sources/io.py) buys on the at-scale
path: a shuffle-regime PageRank whose input is already hash-partitioned
by src skips BOTH setup exchanges (the out-degree agg's and the layout
repartition's) — at 10^12 edges those are two full edge-sized shuffles
before the first superstep. Supersteps themselves are identical by
construction; the delta is all in setup.

Protocol: generate RMAT --scale once, store it both ways, then run
pagerank(n_iter, broadcast_max_vertices=0) against each store,
alternating, --reps times. setup = total wall - sum(superstep walls).
Prints one JSON line; BENCH.md records the result.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(spark, kind: str, path_or_table: str, n_iter: int) -> dict:
    from combblas_spark.algorithms.pagerank import pagerank

    t0 = time.perf_counter()
    if kind == "plain":
        edges = spark.read.parquet(path_or_table)
        layout = None
    else:
        edges = spark.table(path_or_table)
        layout = "src"
    metrics: list = []
    pagerank(
        edges, n_iter=n_iter, broadcast_max_vertices=0,
        metrics=metrics, edge_layout=layout,
    ).count()
    total = time.perf_counter() - t0
    stamps = [m["t"] for m in metrics]
    walls = [b - a for a, b in zip(stamps, stamps[1:])]
    sup = sum(walls) + (walls[0] if walls else 0)  # first stamp ~ first superstep end
    return {"total_s": round(total, 2), "setup_s": round(total - sup, 2),
            "superstep_med_s": round(sorted(walls)[len(walls) // 2], 3) if walls else None}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=20)
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from combblas_spark.graph import build_graph
    from combblas_spark.session import get_spark
    from combblas_spark.sources.io import write_bucketed_edges
    from combblas_spark.sources.rmat import rmat_edges

    spark = get_spark(app_name="bucketed-cold", cores=args.cores)
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = tempfile.mkdtemp(prefix="bktbench")
    plain = os.path.join(d, "plain")
    g = build_graph(rmat_edges(spark, args.scale, args.edgefactor))
    g.write.mode("overwrite").parquet(plain)
    nedges = spark.read.parquet(plain).count()
    # buckets = shuffle width, the layout contract callers should use
    write_bucketed_edges(spark.read.parquet(plain), "bkt_cold_edges",
                         buckets=shuffle_n, key="src",
                         path=os.path.join(d, "bucketed"))

    runs: dict[str, list] = {"plain": [], "bucketed": []}
    for _ in range(args.reps):
        runs["plain"].append(run_one(spark, "plain", plain, args.iters))
        runs["bucketed"].append(run_one(spark, "bucketed", "bkt_cold_edges", args.iters))

    best = {k: min(v, key=lambda r: r["total_s"]) for k, v in runs.items()}
    out = {
        "scale": args.scale, "edges": nedges, "iters": args.iters,
        "cores": args.cores, "buckets": shuffle_n,
        "plain": best["plain"], "bucketed": best["bucketed"],
        "setup_speedup": round(best["plain"]["setup_s"] / best["bucketed"]["setup_s"], 2)
        if best["bucketed"]["setup_s"] > 0 else None,
        "runs": runs,
    }
    spark.sql("DROP TABLE IF EXISTS bkt_cold_edges")
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
