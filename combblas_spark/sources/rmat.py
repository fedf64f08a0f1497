"""Seeded RMAT / Graph500 Kronecker edge generator.

Reference: DistEdgeList::GenGraph500Data (DistEdgeList.cpp:223-270;
RefGen21.h:246-294) with initiator {a,b,c,d} = {.57,.19,.19,.05} and
edgefactor 16 (TopDownBFS.cpp:272).

Spark-first design: ``spark.range(nedges)`` + a vectorized pandas UDF
(mapInPandas, Arrow batches) doing the per-level quadrant sampling in
numpy. Randomness is a counter-based hash (splitmix64 of
(edge_id, level, seed)) so the output is a pure function of the edge id
— deterministic under any partitioning, any parallelism level, and
resume (the analogue of the reference's DETERMINISTIC seeded MTRand,
Operations.h:192-201).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

INITIATOR = (0.57, 0.19, 0.19, 0.05)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain PRNG mix)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _u01(edge_ids: np.ndarray, level: int, seed: int, stream: int) -> np.ndarray:
    """Uniform [0,1) per edge, keyed by (edge_id, level, seed, stream)."""
    key = (
        edge_ids.astype(np.uint64)
        * np.uint64(0x100000001B3)  # FNV prime spreads ids across streams
        + np.uint64(level * 1000003 + stream * 7919 + seed)
    )
    return (_splitmix64(key) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def rmat_pandas(edge_ids: np.ndarray, scale: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """numpy core: (src, dst) for the given edge ids at 2^scale vertices."""
    a, b, c, _d = INITIATOR
    n = edge_ids.shape[0]
    src = np.zeros(n, dtype=np.int64)
    dst = np.zeros(n, dtype=np.int64)
    for level in range(scale):
        r = _u01(edge_ids, level, seed, 0)
        # Quadrant mapping per RefGen21: a=(0,0) b=(0,1) c=(1,0) d=(1,1)
        bit_src = r >= a + b
        bit_dst = ((r >= a) & (r < a + b)) | (r >= a + b + c)
        src = (src << 1) | bit_src.astype(np.int64)
        dst = (dst << 1) | bit_dst.astype(np.int64)
    return src, dst


def rmat_edges(
    spark: SparkSession,
    scale: int,
    edgefactor: int = 16,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """DataFrame (src, dst) of edgefactor * 2^scale RMAT edges
    (duplicates and loops included, like the raw generator output —
    feed through graph.build_graph for the SpParMat-ctor semantics)."""
    nedges = edgefactor * (1 << scale)
    parts = num_partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            src, dst = rmat_pandas(ids, scale, seed)
            yield pd.DataFrame({"src": src, "dst": dst})

    base = spark.range(0, nedges, numPartitions=parts)
    return base.mapInPandas(gen, "src long, dst long")
