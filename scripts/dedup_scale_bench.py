"""Prefix-filter dedup at scale: generate a large deterministic corpus
JVM-side and measure prefix_filter_pairs + near_dup_clusters wall and
throughput. Run at two parallelism levels for the N-vs-4N scaling
record (fresh process per level — each new JVM is cold, same protocol
as scripts/scaling.py):

    python scripts/dedup_scale_bench.py --docs 100000 --cores 8
    python scripts/dedup_scale_bench.py --docs 100000 --cores 32

Corpus: ``--docs`` documents of ``--words`` words drawn from a
``--vocab``-word vocabulary by xxhash64(id, j) — pure Column
expressions, no Python in generation. Every 50th document is a planted
near-dup of its predecessor (one middle word mutated -> 3-gram Jaccard
~0.85), so the expected pair count is ~docs/50 and recall is checkable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def synth_corpus(spark, n_docs: int, n_words: int, vocab_size: int):
    """Deterministic corpus as one select over spark.range — whole-stage
    codegen, linear scale-out, no driver materialization."""
    base = spark.range(0, n_docs).select(F.col("id").alias("doc_id"))
    # near-dup plant: doc 50k+1 reuses doc 50k's words, then mutates one
    src = F.when(F.col("doc_id") % 50 == 1, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    words = F.transform(
        F.sequence(F.lit(1), F.lit(n_words)),
        lambda j: F.concat(F.lit("w"), F.pmod(F.xxhash64(src * n_words + j), F.lit(vocab_size))),
    )
    mutated = F.when(
        F.col("doc_id") % 50 == 1,
        F.concat(
            F.slice(words, 1, n_words // 2),
            F.array(F.concat(F.lit("mut"), F.col("doc_id"))),
            F.slice(words, n_words // 2 + 2, n_words - n_words // 2 - 1),
        ),
    ).otherwise(words)
    return base.select("doc_id", F.concat_ws(" ", mutated).alias("text"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--words", type=int, default=40)
    ap.add_argument("--vocab", type=int, default=50_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--key-encoding", choices=["string", "hash64"], default="hash64",
                    help="candidate-stage shuffle key: xxhash64 longs (library "
                         "default; 2.34x at 400k docs) or shingle strings")
    args = ap.parse_args()

    from combblas_spark import get_spark
    from combblas_spark.functions.dedup import near_dup_clusters, prefix_filter_pairs

    spark = get_spark(app_name="dedup-scale", cores=args.cores,
                      shuffle_partitions=args.cores, driver_memory="16g")
    docs = synth_corpus(spark, args.docs, args.words, args.vocab).localCheckpoint(eager=True)

    t0 = time.time()
    pairs = prefix_filter_pairs(
        docs, threshold=args.threshold, key_encoding=args.key_encoding
    ).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    t_pairs = time.time() - t0

    planted = pairs.where((F.col("id_b") - F.col("id_a") == 1) & (F.col("id_b") % 50 == 1)).count()
    expected = (args.docs - 2) // 50 + 1 if args.docs >= 2 else 0

    t1 = time.time()
    cl = near_dup_clusters(docs, pairs)
    n_clusters = cl.where("is_canonical").count()
    t_cluster = time.time() - t1

    print(json.dumps({
        "docs": args.docs, "cores": args.cores, "threshold": args.threshold,
        "key_encoding": args.key_encoding,
        "pairs": n_pairs, "planted_found": planted, "planted_expected": expected,
        "pairs_sec": round(t_pairs, 2), "cluster_sec": round(t_cluster, 2),
        "docs_per_sec_pairs": round(args.docs / t_pairs),
        "n_clusters": n_clusters,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
