"""Graph500 kernel-2 BFS benchmark — MTEPS over R random roots.

Mirrors the reference harness (Applications/TopDownBFS.cpp:435-467 /
DirOptBFS.cpp:462-475): generate the RMAT graph (kernel 1), run BFS
from R pseudo-random non-isolated roots, count traversed edges as the
sum of degrees of discovered vertices / 2 (TopDownBFS.cpp:457's
EWiseMult(parentsp, degrees).Reduce(plus) halved), report
MTEPS = traversed_edges / time / 1e6 with min/mean/max/harmonic-mean
stats like the Graph500 output.

Usage: python scripts/graph500_bfs.py [--scale 16] [--roots 16]
Prints one JSON line.
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
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--roots", type=int, default=16)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--direction-optimizing", action="store_true")
    ap.add_argument("--validate", action="store_true",
                    help="Graph500 spec kernel-2 validation per root "
                         "(untimed, like the official harness)")
    args = ap.parse_args()

    from combblas_spark.algorithms.bfs import bfs_parents, bfs_tree, validate_bfs_tree
    from combblas_spark.graph import build_graph, degrees
    from combblas_spark.session import get_spark
    from combblas_spark.sources.rmat import rmat_edges

    spark = get_spark(app_name="graph500-bfs", cores=args.cores,
                      shuffle_partitions=args.cores)
    t0 = time.perf_counter()
    g = build_graph(rmat_edges(spark, args.scale, args.edgefactor)).persist()
    nedges = g.count()
    t_k1 = time.perf_counter() - t0

    deg = degrees(g, "out").unionByName(degrees(g, "in")).groupBy("id").agg(
        F.sum("val").alias("val")).persist()
    deg.count()
    # reference picks non-isolated roots from a seeded PRNG
    # (TopDownBFS.cpp:394); here: deterministic hash-ordered sample
    roots = [
        r["id"] for r in deg.orderBy(F.xxhash64("id", F.lit(42)))
        .limit(args.roots).collect()
    ]

    mteps = []
    validated = 0
    for root in roots:
        t1 = time.perf_counter()
        if args.validate:
            tree = bfs_tree(g, root=root, directed=False).persist()
            parents = tree.select("id", "parent")
        else:
            parents = bfs_parents(g, root=root, directed=False)
        # traversed edges = sum of (undirected) degrees of discovered
        # vertices / 2 (TopDownBFS.cpp:455-462 accounting)
        traversed = (
            parents.join(deg, "id").agg(F.sum("val").alias("s")).collect()[0]["s"] or 0.0
        ) / 2.0
        dt = time.perf_counter() - t1
        mteps.append(traversed / dt / 1e6)
        if args.validate:
            # Graph500 spec validation happens OUTSIDE the timed window,
            # like the official harness (validate_bfs_tree docstring)
            res = validate_bfs_tree(g, tree, root=root, directed=False)
            tree.unpersist()
            if not res["ok"]:
                print(json.dumps({"root": root, **res}), file=sys.stderr)
            else:
                validated += 1

    hmean = len(mteps) / sum(1.0 / m for m in mteps if m > 0)
    out = {
        "scale": args.scale,
        "edgefactor": args.edgefactor,
        "edges": nedges,
        "kernel1_s": round(t_k1, 2),
        "roots": len(roots),
        "mteps_min": round(min(mteps), 3),
        "mteps_mean": round(sum(mteps) / len(mteps), 3),
        "mteps_max": round(max(mteps), 3),
        "mteps_harmonic_mean": round(hmean, 3),
        "cores": args.cores,
    }
    if args.validate:
        out["validated_ok"] = f"{validated}/{len(roots)}"
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
