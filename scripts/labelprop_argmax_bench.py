"""A/B: labelprop per-round argmax — sort-window row_number vs hash-agg
min_by(label, struct(-count, label)).

Both keep the exchange-free round (HashPartitioning(dst) satisfies the
(dst,label) count-agg AND the id argmax); the candidate replaces the
per-partition SORT with a second hash aggregate. Equality is asserted
on every run (same labels, both variants) before timing is trusted.

Usage: python scripts/labelprop_argmax_bench.py [--rounds 2] [--reps 3]
Runs on the bench workloads: events link graph at $SPARK_GRAFT_SF_DIR
(default sf0.1) and RMAT scale-18 (bigger than the bench's scale-16 so
the sort actually has work to do).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--rmat-scale", type=int, default=18)
    args = ap.parse_args()

    from combblas_spark.algorithms.labelprop import label_propagation
    from combblas_spark.graph import build_graph, events_graph
    from combblas_spark.session import get_spark
    from combblas_spark.sources.rmat import rmat_edges

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="labelprop_argmax_ab",
                      cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    workloads = {
        "events": events_graph(spark, sf_dir).persist(),
        f"rmat{args.rmat_scale}": build_graph(
            rmat_edges(spark, args.rmat_scale, 16)).persist(),
    }
    for name, g in workloads.items():
        print(f"== {name}: {g.count()} edges", flush=True)
        # correctness gate: identical output both variants
        a = label_propagation(g, n_rounds=args.rounds, argmax="window")
        b = label_propagation(g, n_rounds=args.rounds, argmax="min_by")
        diff = a.join(b.withColumnRenamed("label", "l2"), "id") \
                .filter("label <> l2").count()
        assert diff == 0, f"{name}: {diff} label mismatches"
        print(f"   equality: OK", flush=True)
        for rep in range(args.reps):
            row = {}
            for variant in ("window", "min_by"):
                t0 = time.perf_counter()
                label_propagation(g, n_rounds=args.rounds,
                                  argmax=variant).count()
                row[variant] = round(time.perf_counter() - t0, 3)
            ratio = round(row["min_by"] / row["window"], 3)
            print(f"   rep{rep}: window={row['window']}s "
                  f"min_by={row['min_by']}s  min_by/window={ratio}",
                  flush=True)
        g.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
