"""SpMV — sparse matrix x (sparse|dense) vector over a semiring.

Reference: ``SpMV`` dense (ParFriends.h:2380-2455) and sparse/SpMSpV
(ParFriends.h:2180-2336), plus the ``indexisvalue`` boolean optimization
(ParFriends.h:2362-2374). The reference's comm pattern
(TransposeVector -> AllGatherVector -> LocalSpMV -> Alltoallv ->
MergeContributions) collapses in Spark to ONE join + ONE groupBy.agg:

    y(i) = ADD_j  MULT( A(i,j), x(j) )

With edges stored as rows ``(src, dst, val)`` where ``val = A[src][dst]``:

* ``spmv(edges, x)``                 computes message-passing along edge
  direction: y(dst) = ADD over in-edges MULT(val, x(src))  —  y = A^T x.
  This is the orientation every graph algorithm here uses (rank/label/
  parent flows src -> dst).
* ``spmv(edges, x, transpose=True)`` computes y = A x (gather from dst).

The frontier/vector side is broadcast when small (the analogue of the
reference's adaptive AllGather-vs-Alltoall choice, FastSV.h:252-333 and
CC.h:1251-1294); otherwise it is a shuffle join that AQE plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from combblas_spark.operators.semiring import Semiring, PLUS_TIMES


def spmv(
    edges: DataFrame,
    x: DataFrame,
    sr: Semiring = PLUS_TIMES,
    transpose: bool = False,
    broadcast_vector: bool | None = None,
    index_is_value: bool = False,
) -> DataFrame:
    """y = A^T x (default) or A x (transpose=True) over semiring ``sr``.

    edges: (src long, dst long[, val])  —  missing val treated as 1.0
           (boolean matrix, value elision per ParFriends.h:2362-2374).
    x:     (id long, val)               —  sparse or dense vector rows.
    index_is_value: ignore x.val and use x.id as the multiplied value
           (BFS parent trick, "indexisvalue").
    broadcast_vector: force/disable broadcast of x; None = let AQE pick.

    Returns (id, val) with one row per output coordinate that received
    at least one contribution (sparse output, like SpMSpV).
    """
    join_col, out_col = ("dst", "src") if transpose else ("src", "dst")

    xv = x
    if broadcast_vector is True:
        xv = F.broadcast(xv)
    if index_is_value:
        x_val = F.col("x.id").cast("double")
        xv = xv.select("id")
    else:
        x_val = F.col("x.val")

    e = edges.alias("e")
    a_val = F.col("e.val") if "val" in edges.columns else F.lit(1.0)

    joined = e.join(xv.alias("x"), F.col(f"e.{join_col}") == F.col("x.id"), "inner")
    return (
        joined.select(
            F.col(f"e.{out_col}").alias("id"),
            sr.mult(a_val, x_val).alias("_prod"),
        )
        .groupBy("id")
        .agg(sr.add(F.col("_prod")).alias("val"))
    )
