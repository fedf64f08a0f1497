"""Packed (CSR-block) adjacency + Arrow-vectorized SpMV — the
SURVEY §4(c) experiment.

The reference stores each local submatrix as CSC/DCSC blocks
(SpDCCols; include/CombBLAS/SpDCCols.h) so its local SpMV streams
contiguous arrays. The row-per-edge DataFrame plan instead
materializes an edge-sized join output (one row per nonzero carrying
the vector value) before the aggregation's map-side combine. This
module packs the adjacency into one row per source vertex —
``(src, dsts array<long>, vals array<double>)`` — so that:

  * the per-superstep vector join is SRC-sized, not edge-sized
    (the vector value is attached once per vertex, not once per edge);
  * the edge-sized multiply + local combine runs vectorized in numpy
    over Arrow batches (``mapInArrow``), emitting only per-batch
    partial sums — the shuffle moving into the final groupBy is
    bounded by (distinct dst per batch), the same as the map-side
    combine in the row plan, but produced at memcpy speed.

Packing costs one edge-sized shuffle (same as the cached edge
repartition every iterative algorithm already pays once) and is
reused across all supersteps.

plus_times semiring only — the point of packing is the numpy
``bincount`` fast path; other semirings stay on the row plan.

Status: measured experiment (scripts/packed_bench.py; results in
BENCH.md). The row plan remains the default engine path.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_adjacency(edges: DataFrame, n_parts: int | None = None) -> DataFrame:
    """(src, dsts, vals), one row per source vertex, hash-partitioned by
    src; dsts sorted ascending (deterministic, cache-friendly scatter).
    Missing ``val`` treated as 1.0 (boolean matrix)."""
    val = F.col("val") if "val" in edges.columns else F.lit(1.0)
    packed = (
        edges.select("src", "dst", val.cast("double").alias("val"))
        .groupBy("src")
        .agg(F.array_sort(F.collect_list(F.struct("dst", "val"))).alias("s"))
        .select(
            "src",
            F.transform("s", lambda t: t["dst"]).alias("dsts"),
            F.transform("s", lambda t: t["val"]).alias("vals"),
        )
    )
    if n_parts:
        packed = packed.repartition(n_parts, "src")
    return packed


def spmv_packed(packed: DataFrame, x: DataFrame) -> DataFrame:
    """y = A^T x over plus_times: message-passing along edge direction,
    identical results to ``spmv(edges, x)`` (verified in tests).

    packed: output of pack_adjacency (src, dsts, vals).
    x:      (id long, val double).

    Plan: src-sized join (zero exchange when both sides are
    hash-partitioned on the key), then mapInArrow flattens each batch's
    list columns in numpy, multiplies by the repeated vector value, and
    combines locally with bincount over the batch's compacted dst ids —
    per-batch partials only — then one groupBy(dst) sum.
    """
    joined = packed.join(
        x.select(F.col("id").alias("src"), F.col("val").alias("xv")), "src"
    ).select("dsts", "vals", "xv")

    def _mult(batches: Iterator) -> Iterator:
        import numpy as np
        import pyarrow as pa

        # ONE dense accumulator per PARTITION (not per Arrow batch):
        # emitting per-batch partials multiplies the pre-shuffle output
        # by (batches per partition); this is the vectorized equivalent
        # of the row plan's per-partition map-side combine. The dense
        # array is bounded by n_vertices (ids are dictionary-encoded).
        acc = np.zeros(0)
        hits = np.zeros(0, dtype=np.int64)   # contribution counts per id
        for batch in batches:
            dsts = batch.column(0)
            vals = batch.column(1)
            xv = batch.column(2).to_numpy(zero_copy_only=False)
            if len(xv) == 0:
                continue
            # ListArray offsets -> per-row lengths for value repetition
            offsets = dsts.offsets.to_numpy(zero_copy_only=False)
            lens = np.diff(offsets)
            d = dsts.flatten().to_numpy(zero_copy_only=False)
            w = vals.flatten().to_numpy(zero_copy_only=False) * np.repeat(xv, lens)
            part = np.bincount(d, weights=w, minlength=len(acc))
            cnt = np.bincount(d, minlength=len(hits))
            if len(part) > len(acc):
                part[: len(acc)] += acc
                acc = part
                cnt[: len(hits)] += hits
                hits = cnt
            else:
                acc += part
                hits += cnt
        if len(hits):
            # emit every TOUCHED id, not every nonzero sum: a partition
            # whose contributions cancel to exactly 0.0 must still emit
            # (id, 0.0) — the row plan does, and flatnonzero made the
            # output partition-dependent (review finding r4)
            nz = np.flatnonzero(hits)
            yield pa.RecordBatch.from_arrays(
                [pa.array(nz, type=pa.int64()),
                 pa.array(acc[nz], type=pa.float64())],
                ["id", "val"],
            )

    partial = joined.mapInArrow(_mult, "id long, val double")
    return partial.groupBy("id").agg(F.sum("val").alias("val"))
