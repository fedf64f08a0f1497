"""Winnowing at scale: fingerprint a large deterministic corpus and
measure selection density, pair recall on planted near-dups, and wall.

    python scripts/winnow_scale_bench.py --docs 100000 --cores 32

Reuses the dedup_scale_bench corpus (every 50th doc is a one-word
mutation of its predecessor). A planted pair shares a long unmutated
run (>= half the doc), so by the winnowing guarantee (any shared
substring of k+w-1 tokens shares a fingerprint) recall on the planted
pairs must be 1.0 — it is asserted, not just reported. Density should
track the paper's ~2/(w+1) of k-grams.
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
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--words", type=int, default=40)
    ap.add_argument("--vocab", type=int, default=50_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--w", type=int, default=4)
    ap.add_argument("--min-shared", type=int, default=2)
    ap.add_argument("--max-df", type=int, default=50)
    args = ap.parse_args()

    from combblas_spark import get_spark
    from combblas_spark.functions.dedup import winnow_fingerprints, winnow_pairs
    from scripts.dedup_scale_bench import synth_corpus

    spark = get_spark(app_name="winnow-scale", cores=args.cores,
                      shuffle_partitions=2 * args.cores, driver_memory="20g")
    docs = synth_corpus(spark, args.docs, args.words, args.vocab) \
        .localCheckpoint(eager=True)

    t0 = time.time()
    fps = winnow_fingerprints(docs, k=args.k, w=args.w).localCheckpoint(eager=True)
    n_fp = fps.count()
    t_fp = time.time() - t0
    n_grams = args.docs * (args.words - args.k + 1)

    t0 = time.time()
    pairs = winnow_pairs(docs, k=args.k, w=args.w,
                         min_shared=args.min_shared, max_df=args.max_df) \
        .localCheckpoint(eager=True)
    n_pairs = pairs.count()
    t_pairs = time.time() - t0

    planted = (
        pairs.where((F.col("id_b") - F.col("id_a") == 1)
                    & (F.col("id_b") % 50 == 1)).count()
    )
    expected = sum(1 for i in range(args.docs) if i % 50 == 1)
    recall = planted / expected if expected else 1.0
    # the k+w-1 guarantee makes planted recall exact, not approximate
    assert recall == 1.0, f"planted recall {recall} < 1.0"

    print(json.dumps({
        "docs": args.docs, "cores": args.cores, "k": args.k, "w": args.w,
        "fingerprints": n_fp, "density": round(n_fp / n_grams, 4),
        "paper_density_2_over_w_plus_1": round(2 / (args.w + 1), 4),
        "wall_fingerprint_s": round(t_fp, 2),
        "pairs": n_pairs, "planted_recall": recall,
        "wall_pairs_s": round(t_pairs, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
