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


def salted_spmv(
    edges: DataFrame,
    x: DataFrame,
    sr: Semiring = PLUS_TIMES,
    degree_threshold: int = 100_000,
    n_salts: int = 32,
    transpose: bool = False,
) -> DataFrame:
    """Shuffle-join SpMV with salted repartitioning of heavy-hitter
    vertices (north rule: power-law hubs).

    In the shuffle-join regime (vector too big to broadcast), every edge
    of a join-key vertex lands in ONE reducer partition, so a hub with
    10^8 out-edges serializes. The reference randomly permutes vertex
    ids for the same reason (CC.cpp:161-171; TopDownBFS.cpp:344) — that
    balances *storage* but cannot split a single hub. Here: edges whose
    join-key degree exceeds ``degree_threshold`` get a salt
    ``hash(other-end) % n_salts`` appended to the join key, and the
    vector rows for those hubs are replicated once per salt (a small
    broadcastable table: #heavy * n_salts rows), so the hub's edges
    spread over ``n_salts`` reducers. Results are IDENTICAL to spmv()
    (verified in tests on the power_law_hub fixture): the post-join
    groupBy re-merges contributions with the semiring add, which is
    associative+commutative by definition.

    This mirrors AQE's skew-join splitting but works on the *cached
    pre-partitioned* edge table inside iterative loops, where AQE's
    runtime re-split would re-shuffle every superstep.
    """
    join_col, out_col = ("dst", "src") if transpose else ("src", "dst")

    deg = edges.groupBy(join_col).agg(F.count(F.lit(1)).alias("_deg"))
    heavy = deg.filter(F.col("_deg") > degree_threshold).select(join_col)

    e = edges.join(F.broadcast(heavy.withColumn("_h", F.lit(True))), join_col, "left")
    e = e.withColumn(
        "_salt",
        F.when(F.col("_h"), F.pmod(F.xxhash64(F.col(out_col)), F.lit(n_salts)))
        .otherwise(F.lit(0)),
    ).drop("_h")

    # replicate vector rows of heavy ids across all salts
    x_heavy = (
        x.join(F.broadcast(heavy.withColumnRenamed(join_col, "id")), "id", "left_semi")
        .crossJoin(F.broadcast(
            x.sparkSession.range(n_salts).select(F.col("id").alias("_salt"))))
    )
    x_light = (
        x.join(F.broadcast(heavy.withColumnRenamed(join_col, "id")), "id", "left_anti")
        .withColumn("_salt", F.lit(0))
    )
    xs = x_heavy.unionByName(x_light)

    a_val = F.col("e.val") if "val" in edges.columns else F.lit(1.0)
    joined = e.alias("e").join(
        xs.alias("x"),
        (F.col(f"e.{join_col}") == F.col("x.id")) & (F.col("e._salt") == F.col("x._salt")),
        "inner",
    )
    return (
        joined.select(F.col(f"e.{out_col}").alias("id"), sr.mult(a_val, F.col("x.val")).alias("_prod"))
        .groupBy("id")
        .agg(sr.add(F.col("_prod")).alias("val"))
    )
