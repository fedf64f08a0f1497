"""Explicit Split / Merge — the reference's matrix re-blocking API.

Reference: SpDCCols::ColSplit / ColConcatenate (SpDCCols.cpp:1054,
cut points i*(n/parts), last part absorbs the remainder; exercised by
ReleaseTests/SplitMergeTest.cpp as a split -> concatenate round-trip
identity) and SpParMat::BlockSplit(br, bc) (SpParMat.cpp:2987, an
br x bc grid of row/column-range blocks).

In CombBLAS these reshape the LOCAL storage (each split is a standalone
matrix whose column indices are re-based to 0); the Spark-native twin
keeps the matrix as a (src, dst, val) DataFrame, so a split is a
column-range FILTER plus an index re-base (both pushed into the scan by
Catalyst — a split never materializes anything) and a merge is a
re-offset UNION. The round-trip is an exact identity, which is the
whole contract SplitMergeTest.cpp checks. Splitting is the phased-
SpGEMM memory device (operators/spgemm.py uses ad-hoc column buckets);
this module is the explicit user-facing API for the same layout move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cuts(n: int, parts: int) -> list[tuple[int, int]]:
    """[start, end) column ranges with the reference's cut rule:
    boundaries at i*(n/parts) (integer division), last part takes the
    remainder (SpDCCols.cpp:1063-1066)."""
    if parts < 2 or n < parts:
        return [(0, n)]
    w = n // parts
    starts = [i * w for i in range(parts)]
    ends = starts[1:] + [n]
    return list(zip(starts, ends))


def col_split(m: DataFrame, parts: int, ncols: int,
              col: str = "dst") -> list[dict]:
    """Split into ``parts`` contiguous column-range slices. Returns a
    list of {"df", "offset", "ncols"}: each slice's ``col`` is re-based
    to 0 (local indexing, like each SpDCCols split), with the range
    metadata needed to merge. Pure narrow ops — each slice's plan is a
    filter + projection over the parent, no shuffle, no materialization.
    """
    out = []
    for lo, hi in _cuts(ncols, parts):
        df = (m.where((F.col(col) >= lo) & (F.col(col) < hi))
              .withColumn(col, F.col(col) - F.lit(lo)))
        out.append({"df": df, "offset": lo, "ncols": hi - lo})
    return out


def col_concatenate(slices: list[dict], col: str = "dst") -> DataFrame:
    """ColConcatenate: re-offset each slice by the cumulative width of
    the slices before it and union — the exact inverse of col_split
    (SplitMergeTest.cpp round-trip). Accepts any slices produced with
    the same rule; offsets are recomputed from widths so slices can be
    re-ordered storage-side without changing the logical matrix."""
    parts = []
    off = 0
    for s in slices:
        parts.append(s["df"].withColumn(col, F.col(col) + F.lit(off)))
        off += s["ncols"]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def block_split(m: DataFrame, br: int, bc: int, nrows: int, ncols: int,
                row: str = "src", col: str = "dst") -> list[list[dict]]:
    """SpParMat::BlockSplit(br, bc): an br x bc grid of blocks, each
    with locally re-based row AND column indices plus its offsets.
    Same narrow-op properties as col_split."""
    grid = []
    for rlo, rhi in _cuts(nrows, br):
        rowblocks = []
        for clo, chi in _cuts(ncols, bc):
            df = (m.where((F.col(row) >= rlo) & (F.col(row) < rhi)
                          & (F.col(col) >= clo) & (F.col(col) < chi))
                  .withColumn(row, F.col(row) - F.lit(rlo))
                  .withColumn(col, F.col(col) - F.lit(clo)))
            rowblocks.append({"df": df, "row_offset": rlo, "nrows": rhi - rlo,
                              "col_offset": clo, "ncols": chi - clo})
        grid.append(rowblocks)
    return grid


def block_merge(grid: list[list[dict]], row: str = "src",
                col: str = "dst") -> DataFrame:
    """Inverse of block_split: shift every block back by its recorded
    offsets and union."""
    out = None
    for rowblocks in grid:
        for b in rowblocks:
            df = (b["df"]
                  .withColumn(row, F.col(row) + F.lit(b["row_offset"]))
                  .withColumn(col, F.col(col) + F.lit(b["col_offset"])))
            out = df if out is None else out.unionByName(df)
    return out


def blocked_spgemm(A: DataFrame, B: DataFrame, br: int, bc: int,
                   nrows: int, ncols: int):
    """BlockSpGEMM (include/CombBLAS/BlockSpGEMM.h, exercised by
    ReleaseTests/BlockedSpGEMM.cpp): C = A (x) B produced one output
    block at a time — the getNextBlock iterator. Output block (i, j) is
    A[row range i] x B[col range j] with the inner dimension FULL (the
    row/col restrictions distribute over the product), indices re-based
    to the block, offsets reported alongside.

    Yields {"df", "row_offset", "nrows", "col_offset", "ncols"} in the
    reference's row-major block order. Re-offsetting and unioning all
    blocks (block_merge) reproduces spgemm(A, B) exactly — the blocked
    form exists so ONE block's working set at a time needs memory, the
    same phasing motive as spgemm_phased, but on the OUTPUT dimension.
    Each block's plan is a filter-pushed restriction of the same join;
    Catalyst prunes the scan per block.

    ``nrows``: row count of A; ``ncols``: column count of B.
    """
    from combblas_spark.operators.spgemm import spgemm

    for rlo, rhi in _cuts(nrows, br):
        for clo, chi in _cuts(ncols, bc):
            a = A.where((F.col("src") >= rlo) & (F.col("src") < rhi))
            b = B.where((F.col("dst") >= clo) & (F.col("dst") < chi))
            blk = (spgemm(a, b)
                   .withColumn("src", F.col("src") - F.lit(rlo))
                   .withColumn("dst", F.col("dst") - F.lit(clo)))
            yield {"df": blk, "row_offset": rlo, "nrows": rhi - rlo,
                   "col_offset": clo, "ncols": chi - clo}
