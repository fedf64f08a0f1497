"""A/B: dedup_exact representative pick — row_number window (old) vs
min_by(struct(row), id) aggregate (adopted).

Corpus: N synthetic docs, dup_frac of them byte-identical copies of an
earlier doc (the web-corpus shape exact dedup exists for). Both
variants must return identical (doc_id set) results; walls are printed
per rep. The min_by variant's partial aggregate collapses duplicates
before the fingerprint shuffle; the window ships every row into the
sort. Expect the gap to grow with N * dup_frac.

Usage: python scripts/dedup_exact_ab.py [--docs 1000000] [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--dup-frac", type=float, default=0.3)
    ap.add_argument("--pad", type=int, default=0,
                    help="extra body bytes per doc (realistic web docs "
                         "are KBs; the shuffle-byte gap scales with this)")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from combblas_spark.functions.dedup import dedup_exact
    from combblas_spark.functions.text import fingerprint
    from combblas_spark.session import get_spark

    spark = get_spark(app_name="dedup_exact_ab",
                      cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    n = args.docs
    n_base = int(n * (1.0 - args.dup_frac))
    # doc i < n_base: distinct text; doc i >= n_base: copy of doc (i % n_base).
    docs = (
        spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("synthetic web document body number "),
                F.when(F.col("id") < n_base, F.col("id"))
                 .otherwise(F.col("id") % n_base).cast("string"),
                F.lit(" with some shared boilerplate tail text"),
                F.lit(" lorem-ipsum-filler" * (args.pad // 18)),
            ).alias("text"),
        ).repartition(64).persist()
    )
    print(f"docs={docs.count()} distinct_texts={n_base}", flush=True)

    def dedup_window(d):
        w = Window.partitionBy(fingerprint(F.col("text"))).orderBy(F.col("doc_id").asc())
        return d.withColumn("_rn", F.row_number().over(w)) \
                .filter(F.col("_rn") == 1).drop("_rn")

    def dedup_semijoin(d):
        # thin (fp, id) projection -> map-side-combinable min(id) ->
        # semi-join full rows back on id. Full rows cross ONE hash
        # shuffle (no sort, no agg buffer).
        keep = (
            d.select(fingerprint(F.col("text")).alias("_fp"),
                     F.col("doc_id"))
            .groupBy("_fp").agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        return d.join(keep, "doc_id", "left_semi")

    variants = {"window": dedup_window, "min_by": dedup_exact,
                "semijoin": dedup_semijoin}
    sums = {k: v(docs).selectExpr("sum(doc_id) s", "count(*) c").collect()[0]
            for k, v in variants.items()}
    ref = sums["window"]
    assert all((r.s, r.c) == (ref.s, ref.c) for r in sums.values()) \
        and ref.c == n_base, (sums, n_base)
    print("equality: OK", flush=True)

    for rep in range(args.reps):
        row = {}
        for k, v in variants.items():
            t0 = time.perf_counter()
            v(docs).count()
            row[k] = time.perf_counter() - t0
        print("rep%d: " % rep + "  ".join(f"{k}={t:.2f}s" for k, t in row.items()),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
