"""Reductions: matrix->vector, vector->scalar, k-select, skew metrics
(SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from combblas_spark.portable import pround


def reduce_dim(
    edges: DataFrame,
    dim: str,
    agg: Callable[[Column], Column] = F.sum,
    unop: Callable[[Column], Column] | None = None,
    val_col: str = "val",
) -> DataFrame:
    """Row-/column-wise reduce of a matrix to a vector — degrees, column
    sums (SpParMat::Reduce, SpParMat.h:110-123, SpParMat.cpp:888-1118).

    dim='row' groups by src (reduce along each row); dim='col' by dst.
    Map-side partial aggregation gives the skew resilience the reference
    gets from its tree-reduce.
    """
    key = "src" if dim == "row" else "dst"
    v = F.col(val_col) if val_col in edges.columns else F.lit(1.0)
    if unop is not None:
        v = unop(v)
    return edges.groupBy(F.col(key).alias("id")).agg(agg(v).alias("val"))


def masked_reduce(edges: DataFrame, dim: str, mask: DataFrame,
                  agg: Callable[[Column], Column] = F.sum,
                  exclude: bool = False) -> DataFrame:
    """Reduce restricted to (or excluding) masked ids
    (SpParMat::MaskedReduce, SpParMat.cpp:1849-1993). mask: (id) rows;
    the mask selects which OTHER-dimension ids participate."""
    other = "dst" if dim == "row" else "src"
    how = "left_anti" if exclude else "left_semi"
    filtered = edges.join(mask.select(F.col(mask.columns[0]).alias(other)), other, how)
    return reduce_dim(filtered, dim, agg)


def reduce_scalar(v: DataFrame, agg: Callable[[Column], Column] = F.sum,
                  unop: Callable[[Column], Column] | None = None):
    """Global fold to a driver-side scalar (FullyDistVec::Reduce,
    FullyDistVec.h:265-269). The collect() IS the MPI_Allreduce."""
    c = F.col("val") if unop is None else unop(F.col("val"))
    return v.agg(agg(c).alias("v")).collect()[0]["v"]


def count_pred(v: DataFrame, pred: Column) -> int:
    """Count elements satisfying a predicate (FullyDistVec::Count,
    FullyDistVec.h:181-182)."""
    return v.filter(pred).count()


def min_element(v: DataFrame) -> tuple[int, float]:
    """Global argmin -> (id, val) (FullyDistVec::MinElement,
    FullyDistVec.h:262). Deterministic tie-break on id; raises on an
    empty vector (review r4: IndexError otherwise)."""
    rows = v.orderBy(F.col("val").asc(), F.col("id").asc()).limit(1).collect()
    if not rows:
        raise ValueError("min_element: empty vector")
    return rows[0]["id"], rows[0]["val"]


def kselect(edges: DataFrame, k: int, dim: str = "col",
            ascending: bool = False) -> DataFrame:
    """Per-column (or per-row) k largest values — distributed top-k
    (SpParMat::Kselect, SpParMat.h:125-137, SpParMat.cpp:1120-1413).

    The reference needs ~700 LoC of median-of-medians; here it is a
    window rank. Returns the retained (src, dst, val) triples. Ties are
    broken deterministically on the other coordinate.
    """
    key = "dst" if dim == "col" else "src"
    other = "src" if dim == "col" else "dst"
    order = [F.col("val").asc() if ascending else F.col("val").desc(), F.col(other).asc()]
    w = Window.partitionBy(key).orderBy(*order)
    return (
        edges.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def prune_recovery_select(
    edges: DataFrame,
    threshold: float,
    recover_num: int,
    recover_pct: float = 0.9,
) -> DataFrame:
    """Column-wise threshold prune with recovery
    (MCLPruneRecoverySelect, ParFriends.h:186-330): drop entries below
    ``threshold``; a column is RECOVERED — its top ``recover_num``
    original entries kept instead — when BOTH (a) its kept mass fell
    below ``recover_pct`` of its pre-prune mass (ParFriends.h:218
    ``colSums < recoverPct``; the reference compares the raw sum
    because MCL columns are stochastic — scaling by ``_mass`` makes
    the same rule work on unnormalized matrices) and (b) its
    post-prune nnz fell below ``recover_num`` (ParFriends.h:208
    ``nnzPerColumn < recoverNum``). Round 2 inverted this (recovered
    only on >90% mass loss, ignored the nnz precondition — ADVICE r2);
    engine and both DuckDB oracles now carry the reference rule.
    One window rank + per-column stats; no driver loop.

    The reference's recovery-after-selection pass (ParFriends.h:290-330)
    is intentionally absent: it can only trigger when select_num <
    recover_num (selection cuts a column below recover_num), and every
    caller here keeps select_k >= recover_num (mcl() asserts this).
    """
    w = Window.partitionBy("dst").orderBy(F.col("val").desc(), F.col("src").asc())
    stats = Window.partitionBy("dst")
    annotated = (
        edges.withColumn("_rk", F.row_number().over(w))
        .withColumn("_mass", F.sum("val").over(stats))
        .withColumn(
            "_kept_mass",
            F.sum(F.when(F.col("val") >= threshold, F.col("val")).otherwise(0.0)).over(stats),
        )
        .withColumn(
            "_kept_nnz",
            F.sum(F.when(F.col("val") >= threshold, F.lit(1)).otherwise(F.lit(0))).over(stats),
        )
    )
    recovered_col = (
        (F.col("_kept_mass") < recover_pct * F.col("_mass"))
        & (F.col("_kept_nnz") < recover_num)
    )
    return (
        annotated.filter(
            (~recovered_col & (F.col("val") >= threshold))
            | (recovered_col & (F.col("_rk") <= recover_num))
        )
        .select("src", "dst", "val")
    )


def kth_value(edges: DataFrame, k: int, dim: str = "col") -> DataFrame:
    """Per-column k-th largest value as a vector (Kselect's scalar form)."""
    key = "dst" if dim == "col" else "src"
    w = Window.partitionBy(key).orderBy(F.col("val").desc())
    return (
        edges.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == k)
        .select(F.col(key).alias("id"), "val")
    )


def nnz(df: DataFrame) -> int:
    """Global nonzero count (getnnz, SpParMat.h:209-211)."""
    return df.count()


def load_imbalance(df: DataFrame) -> float:
    """max/avg rows per partition — the reference's skew metric
    (SpParMat::LoadImbalance, SpParMat.cpp:762). North-rule metric.
    Delegates to runtime.superstep so both call sites share ONE
    definition that counts EMPTY partitions in the average, like the
    reference's max * p / total over all ranks (review r4: the old
    groupBy-only form dropped empty partitions, understating skew)."""
    from combblas_spark.runtime.superstep import (
        load_imbalance as _li, partition_histogram)

    return _li(partition_histogram(df))


def bandwidth(edges: DataFrame) -> int:
    """Matrix bandwidth max|i-j| (SpParMat::Bandwidth, SpParMat.h:139-140).
    0 for an empty matrix (the agg returns NULL — review r4)."""
    b = edges.agg(F.max(F.abs(F.col("src") - F.col("dst"))).alias("b")).collect()[0]["b"]
    return int(b) if b is not None else 0


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of the undirected
    simple graph: Pearson correlation of the endpoint degrees over the
    symmetrized edge list (each undirected edge contributes both
    orientations, the standard convention). Returns one row
    (r, n_edges); r is NULL when a degree variance is zero (regular
    graph — the coefficient is undefined).

    Cross-engine-exact by construction: the six moment sums are
    integer aggregates (bit-exact under any partitioning/order), and
    the final combination uses only double *, -, /, sqrt — all IEEE
    correctly-rounded — so the DuckDB twin matches to the bit before
    the 6dp rounding. (Spark's corr() aggregates doubles incrementally
    and is order-dependent; deliberately not used.)
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b")).distinct()
    )
    dirs = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    deg = dirs.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    pairs = (
        dirs.join(deg, "src")
        .join(deg.select(F.col("src").alias("dst"), F.col("deg").alias("degd")), "dst")
    )
    m = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("deg").alias("sx"), F.sum("degd").alias("sy"),
        F.sum(F.col("deg") * F.col("degd")).alias("sxy"),
        F.sum(F.col("deg") * F.col("deg")).alias("sx2"),
        F.sum(F.col("degd") * F.col("degd")).alias("sy2"),
    )
    # combine in DOUBLE: the integer sums are exact, and doing the
    # products in double avoids the long-overflow cliff at web scale
    # while staying bit-identical to the SQL twin (same IEEE ops)
    n_d, sx, sy = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxy, sx2, sy2 = (F.col(c).cast("double") for c in ("sxy", "sx2", "sy2"))
    vx = n_d * sx2 - sx * sx
    vy = n_d * sy2 - sy * sy
    r = (n_d * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy))
    return m.select(
        pround(F.when((vx > 0) & (vy > 0), r)).alias("r"),
        (F.col("n") / 2).cast("long").alias("n_edges"),
    )


def avg_neighbor_degree(edges: DataFrame) -> DataFrame:
    """Degree-correlation curve knn(k) (Pastor-Satorras et al. 2001) of
    the undirected simple graph: for each degree value k, the mean over
    vertices of degree k of their mean neighbor degree. The per-degree
    companion of the scalar ``degree_assortativity`` — webgraphs are
    read off this curve (rising = assortative core, falling =
    hub-and-spoke). Returns (deg, knn, n_vertices), knn rounded 6dp.

    Cross-engine-exact the assortativity way: per-vertex neighbor-
    degree SUMS are integer aggregates, and within a degree-k group
    every vertex divides by the same k, so

        knn(k) = (sum over deg-k vertices of S_v) / (k * n_k)

    is ONE double division of exact integers — no order-dependent
    double summation anywhere. Scale: same symmetrized-edge degree
    join as assortativity, then two hash aggs (per-vertex, per-degree);
    nothing is vertex-squared and the final table is degree-distinct
    (tiny).
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b")).distinct()
    )
    dirs = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    deg = dirs.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    svert = (
        dirs.join(deg.select(F.col("src").alias("dst"), F.col("deg").alias("_nd")), "dst")
        .groupBy("src").agg(F.sum("_nd").alias("_s"))
    )
    return (
        deg.join(svert, "src")
        .groupBy("deg")
        .agg(F.sum("_s").alias("_ss"), F.count(F.lit(1)).alias("n_vertices"))
        .select(
            "deg",
            pround(
                F.col("_ss").cast("double")
                / (F.col("deg").cast("double") * F.col("n_vertices").cast("double"))).alias("knn"),
            "n_vertices",
        )
    )
