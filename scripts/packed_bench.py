"""Measured experiment: row-per-edge SpMV vs packed (CSR-block +
mapInArrow) SpMV — SURVEY §4(c). Steady-state per-multiply walls on a
cached input, median of K runs, identical final reduce both sides.

Usage: python scripts/packed_bench.py [--scale 22] [--cores 32] [--k 5]
Prints one JSON line; paste the numbers into BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=22)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--k", type=int, default=5)
    args = ap.parse_args()

    from combblas_spark.graph import build_graph
    from combblas_spark.operators.packed import pack_adjacency, spmv_packed
    from combblas_spark.operators.spmv import spmv
    from combblas_spark.session import get_spark
    from combblas_spark.sources.rmat import rmat_edges

    spark = get_spark(app_name="packed-bench", cores=args.cores,
                      shuffle_partitions=2 * args.cores, driver_memory="20g")
    spark.sparkContext.setLogLevel("ERROR")

    path = f"/tmp/rmat{args.scale}.parquet"
    if not os.path.exists(path):
        build_graph(rmat_edges(spark, args.scale, 16)).write.parquet(path)
    edges = spark.read.parquet(path)

    n_parts = 2 * args.cores
    row_edges = edges.repartition(n_parts, "src").persist()
    nedges = row_edges.count()
    x = (edges.select(F.col("src").alias("id")).distinct()
         .withColumn("val", (F.col("id") % 7 + 1).cast("double"))
         .repartition(n_parts, "id").persist())
    nv = x.count()

    def timeit(fn):
        walls = []
        for _ in range(args.k):
            t0 = time.perf_counter()
            out = fn()
            chk = out.agg(F.sum("val").alias("s"), F.count("*").alias("n")).collect()[0]
            walls.append(time.perf_counter() - t0)
        return walls, (chk["s"], chk["n"])

    row_walls, row_chk = timeit(lambda: spmv(row_edges, x, broadcast_vector=False))

    t0 = time.perf_counter()
    packed = pack_adjacency(edges, n_parts).persist()
    npack = packed.count()
    pack_wall = time.perf_counter() - t0
    packed_walls, packed_chk = timeit(lambda: spmv_packed(packed, x))

    assert row_chk[1] == packed_chk[1], (row_chk, packed_chk)
    assert abs(row_chk[0] - packed_chk[0]) <= 1e-6 * abs(row_chk[0])

    med_r = statistics.median(row_walls)
    med_p = statistics.median(packed_walls)
    print(json.dumps({
        "scale": args.scale, "edges": nedges, "vertices": nv,
        "packed_rows": npack, "cores": args.cores,
        "row_walls": [round(w, 3) for w in row_walls],
        "packed_walls": [round(w, 3) for w in packed_walls],
        "row_median": round(med_r, 3),
        "packed_median": round(med_p, 3),
        "speedup": round(med_r / med_p, 3),
        "pack_cost": round(pack_wall, 3),
        "checksum": row_chk[0],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
