"""Measured experiment: the TF-cosine similarity join's ``max_df`` hub
cap at corpus scale (the 100-TB stopword-suppression path that
``tf_cosine_capped`` exercises at driver-gate scale).

The join's cost is sum_t df(t)^2 (inverted-index term-at-a-time, never
all-pairs), so stopword-like hub tokens dominate: one token in n/5 of
the docs contributes (n/5)^2 intermediate pairs on its own. The corpus
here makes that concrete — each doc carries ``content`` near-unique
tokens (df ~ doc multiplicity) plus ``stop`` tokens drawn from a
50-token hot vocabulary (df ~ n/5) — and the bench measures the SAME
query capped vs uncapped.

Deterministic: every token is a pure counter-hash function of
(doc_id, slot); no RNG state, partition-invariant.

Usage: python scripts/tf_cosine_scale_bench.py [--docs 30000]
       [--content 40] [--stop 10] [--max-df 1000] [--cores 32]
       [--skip-uncapped]   # uncapped is O(2 n^2/25) — minutes at 30k,
                           # unrunnable at web scale; that is the point
Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_docs(spark, n: int, content: int, stop: int):
    """(doc_id, text): ``content`` tokens from an n-sized vocabulary
    (each token shared by ~4 docs -> df ~ 4) + ``stop`` tokens from a
    50-token hot vocabulary (df ~ n * stop / 50)."""

    def u(i, j, salt):
        x = (i * 2654435761 + j * 40503 + salt * 69069) & 0xFFFFFFFF
        x ^= x >> 16
        x = (x * 2246822519) & 0xFFFFFFFF
        x ^= x >> 13
        return x

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for i in ids:
                # planted near-dups: docs (i, i+1) at i % 100 == 0 share
                # their whole content-token set (identical seed base)
                base = i - (i % 2) if (i % 100) < 2 else i
                toks = [f"w{u(np.int64(base), np.int64(j), np.int64(1)) % max(1, nv)}"
                        for j in range(content)]
                toks += [f"s{u(np.int64(i), np.int64(j), np.int64(2)) % 50}"
                         for j in range(stop)]
                texts.append(" ".join(toks))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    nv = max(1, n // 4)  # content vocab: ~4 docs per token
    return (spark.range(n).repartition(64)
            .mapInPandas(make, "doc_id long, text string"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=30_000)
    ap.add_argument("--content", type=int, default=40)
    ap.add_argument("--stop", type=int, default=10)
    ap.add_argument("--max-df", type=int, default=1000)
    ap.add_argument("--min-cos", type=float, default=0.5)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--skip-uncapped", action="store_true")
    args = ap.parse_args()

    from combblas_spark.functions.similarity import tf_cosine_pairs
    from combblas_spark.session import get_spark

    spark = get_spark(app_name="tfcos-scale", cores=args.cores,
                      shuffle_partitions=2 * args.cores, driver_memory="20g")
    spark.sparkContext.setLogLevel("ERROR")

    docs = gen_docs(spark, args.docs, args.content, args.stop).persist()
    n = docs.count()

    configs = [("capped", args.max_df)]
    if not args.skip_uncapped:
        configs.append(("uncapped", None))
    n_planted = len(range(0, args.docs - 1, 100))
    for name, max_df in configs:
        t0 = time.perf_counter()
        pairs = tf_cosine_pairs(docs, min_cos=args.min_cos, max_df=max_df)
        from pyspark.sql import functions as F
        got = pairs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when((F.col("id_b") - F.col("id_a") == 1)
                         & (F.col("id_a") % 100 == 0), 1)
                  .otherwise(0)).alias("planted_found")).collect()[0]
        wall = round(time.perf_counter() - t0, 1)
        print(json.dumps({
            "config": name, "docs": n, "max_df": max_df,
            "min_cos": args.min_cos, "pairs": got["n"] or 0,
            "planted_found": got["planted_found"] or 0,
            "planted": n_planted, "wall": wall,
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
