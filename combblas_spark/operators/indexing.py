"""Indexing / assignment / permutation — the "joins family" (SURVEY.md §2.5).

The reference implements general indexing as SpGEMM with permutation
matrices (SubsRef_SR = Pr * A * Pc^T, SpParMat.cpp:2030-2264). In Spark
each of these is one or two joins — no matrix algebra detour needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transpose(edges: DataFrame) -> DataFrame:
    """Global transpose (SpParMat::Transpose, SpParMat.cpp:3541-3601).
    A pairwise block exchange in the reference; a free column swap here."""
    cols = [F.col("dst").alias("src"), F.col("src").alias("dst")]
    if "val" in edges.columns:
        cols.append(F.col("val"))
    return edges.select(*cols)


def remove_loops(edges: DataFrame) -> DataFrame:
    """Delete the diagonal (SpParMat::RemoveLoops, SpParMat.cpp:3270)."""
    return edges.filter(F.col("src") != F.col("dst"))


def add_loops(edges: DataFrame, verts: DataFrame, loop_val: float = 1.0) -> DataFrame:
    """Insert diagonal entries for every vertex id in ``verts`` that lacks
    one (SpParMat::AddLoops, SpParMat.cpp:3290-3307)."""
    existing = edges.filter(F.col("src") == F.col("dst")).select(F.col("src").alias("id"))
    missing = verts.select("id").join(existing, "id", "left_anti")
    loops = missing.select(
        F.col("id").alias("src"), F.col("id").alias("dst"),
        F.lit(float(loop_val)).alias("val"))
    base = edges if "val" in edges.columns else edges.withColumn("val", F.lit(1.0))
    return base.unionByName(loops)


def subsref(edges: DataFrame, ri: DataFrame | None, ci: DataFrame | None) -> DataFrame:
    """A(ri, ci) submatrix extraction with relabeling
    (SpParMat::SubsRef_SR / operator(), SpParMat.cpp:2030, SpParMat.h:219-238).

    ri/ci: (pos long, id long) — pos is the new index, id the old one.
    Pass None to keep a dimension whole (SpParMat.cpp:2266 row/col-only).
    Implemented as two relabeling joins, the Spark form of Pr*A*Pc^T.
    """
    out = edges
    if ri is not None:
        r = ri.select(F.col("id").alias("src"), F.col("pos").alias("_nsrc"))
        out = out.join(r, "src", "inner").drop("src").withColumnRenamed("_nsrc", "src")
    if ci is not None:
        c = ci.select(F.col("id").alias("dst"), F.col("pos").alias("_ndst"))
        out = out.join(c, "dst", "inner").drop("dst").withColumnRenamed("_ndst", "dst")
    cols = ["src", "dst"] + (["val"] if "val" in edges.columns else [])
    return out.select(*cols)


def spasgn(A: DataFrame, ri: DataFrame, ci: DataFrame, B: DataFrame) -> DataFrame:
    """A(ri,ci) = B — submatrix assignment = zero-out region + insert
    relabeled B (SpParMat::SpAsgn, SpParMat.cpp:2436-2483).

    ri/ci: (pos, id) maps from B's coordinates (pos) to A's (id).
    """
    cleared = A.join(ri.select(F.col("id").alias("src")), "src", "left_anti").unionByName(
        A.join(ri.select(F.col("id").alias("src")), "src", "left_semi")
         .join(ci.select(F.col("id").alias("dst")), "dst", "left_anti")
         .select(*A.columns)
    )
    r = ri.select(F.col("pos").alias("src"), F.col("id").alias("_asrc"))
    c = ci.select(F.col("pos").alias("dst"), F.col("id").alias("_adst"))
    placed = (
        B.join(r, "src", "inner").join(c, "dst", "inner")
        .select(F.col("_asrc").alias("src"), F.col("_adst").alias("dst"), F.col("val"))
    )
    return cleared.select("src", "dst", "val").unionByName(placed)


def vector_subsref(v: DataFrame, ri: DataFrame) -> DataFrame:
    """Gather v[ri] (FullyDistVec::operator(), FullyDistVec.cpp:934).
    ri: (pos, id); returns (id=pos, val=v[id])."""
    return (
        ri.join(v.withColumnRenamed("id", "_vid"), ri["id"] == F.col("_vid"), "inner")
        .select(F.col("pos").alias("id"), F.col("val"))
    )


def vector_assign(v: DataFrame, updates: DataFrame, combine=F.min) -> DataFrame:
    """Scatter with duplicate combining — dense[ind] op= val
    (FastSV::Assign / ReduceAssign, Applications/FastSV.h:68-200;
    FullyDistVec::Set, FullyDistVec.h:153-157).

    The groupBy pre-combine IS the reference's adaptive skew fix (it
    MPI-reduces duplicates before the scatter); Spark's partial
    aggregation does the same map-side.
    """
    u = updates.groupBy("id").agg(combine(F.col("val")).alias("_uval"))
    return (
        v.join(u, "id", "left")
        .select("id", F.coalesce(F.col("_uval"), F.col("val")).alias("val"))
    )


def vector_extract(v: DataFrame, idx: DataFrame) -> DataFrame:
    """q[i] = v[idx[i]] gather (FastSV::Extract, Applications/FastSV.h:252-333).
    idx: (id, val=index-to-read). Adaptive bcast-vs-alltoall in the
    reference; AQE's broadcast decision here."""
    return (
        idx.select(F.col("id"), F.col("val").alias("_ptr"))
        .join(v.select(F.col("id").alias("_ptr"), F.col("val")), "_ptr", "inner")
        .select("id", "val")
    )


def invert(v: DataFrame, combine=F.min) -> DataFrame:
    """Sparse-vector index<->value inversion (FullyDistSpVec::Invert,
    FullyDistSpVec.cpp:1799), duplicate values combined."""
    return (
        v.select(F.col("val").cast("long").alias("id"), F.col("id").cast("double").alias("val"))
        .groupBy("id").agg(combine(F.col("val")).alias("val"))
    )


def zip_with_index(df: DataFrame, order_cols: list, keep_cols: list[str],
                   pos_col: str = "pos") -> DataFrame:
    """JVM-only distributed zipWithIndex over a TOTAL order.

    Plan shape (no Python worker anywhere — VERDICT r2 "what's wrong"
    #2 replaced the ``.rdd.map(...).zipWithIndex()`` form, which
    pickled every row through Python and was the one per-row-Python
    path left on the 100-TB ingestion route):

      1. orderBy(order_cols) — range-partitioned distributed sort —
         then eager localCheckpoint, PINNING the partitioning so steps
         2 and 3 read the SAME materialized partitions;
      2. one tiny job collects rows-per-partition
         (groupBy spark_partition_id; numPartitions rows to the
         driver) -> cumulative offsets, embedded as a literal map;
      3. pos = offset[pid] + local row number, both decoded from
         ``monotonically_increasing_id()`` (upper bits = partition id,
         lower 33 = record number in partition iteration order, which
         for the checkpointed sorted partitions IS the sort order).

    Because the order is TOTAL (callers break ties on id), positions
    are independent of partitioning/parallelism — property-tested at
    local[2] vs local[8]. The checkpoint is what makes the two passes
    consistent: re-running the sort could re-sample range boundaries.
    At >10^4 partitions swap the literal map for a broadcast join on
    pid; at the current design point the map is bytes.
    """
    ordered = df.orderBy(*order_cols).select(*keep_cols).localCheckpoint(eager=True)
    counts = ordered.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    offsets: list = []
    acc = 0
    for r in sorted(counts, key=lambda r: r["pid"]):
        offsets += [F.lit(int(r["pid"])).cast("long"), F.lit(acc).cast("long")]
        acc += r["count"]
    if not offsets:
        # empty input: create_map() types as map<void,void> and fails
        # analysis — return the (empty) result with the right schema
        return ordered.select(F.lit(None).cast("long").alias(pos_col), *keep_cols)
    mapping = F.create_map(*offsets)
    mid = F.monotonically_increasing_id()
    pos = mapping[F.shiftrightunsigned(mid, 33)] + mid.bitwiseAND(F.lit((1 << 33) - 1))
    return ordered.select(pos.alias(pos_col), *keep_cols)


def prefix_sum(df: DataFrame, order_cols: list, weight_col: str,
               keep_cols: list[str], start_col: str = "start") -> DataFrame:
    """Distributed EXCLUSIVE prefix sum (scan) of ``weight_col`` over a
    TOTAL order — the weighted generalization of zip_with_index (which
    is prefix_sum with weight 1). Returns (start_col, *keep_cols) where
    start = sum of weights strictly before this row in order.
    Weights are INTEGER (cast to long — offsets are exact in any
    aggregation order; a float weight would silently truncate, so
    callers with fractional weights must pre-scale to integers).

    Plan shape (same two-pass trick as zip_with_index): the ordered
    checkpoint pins range partitions; one tiny job collects
    PER-PARTITION WEIGHT SUMS -> cumulative offsets as a literal map;
    the within-partition running sum is a window partitioned by
    spark_partition_id — bounded by one range partition, NEVER a
    global single-partition window. Positions are partitioning-
    invariant because the order is total (callers break ties on id).

    The scan primitive a packing/layout pipeline needs (sequence
    packing, CSR offsets, chunked file layout); CombBLAS expresses the
    same thing as FullyDistVec prefix offsets inside its I/O paths
    (SpParHelper.h partial-sum exchanges).
    """
    ordered = (
        df.orderBy(*order_cols)
        .select(F.col(weight_col).cast("long").alias("_w"), *keep_cols)
        .localCheckpoint(eager=True)
    )
    sums = ordered.groupBy(F.spark_partition_id().alias("pid")).agg(
        F.sum("_w").alias("s")).collect()
    offsets: list = []
    acc = 0
    for r in sorted(sums, key=lambda r: r["pid"]):
        offsets += [F.lit(int(r["pid"])).cast("long"), F.lit(acc).cast("long")]
        acc += int(r["s"])
    if not offsets:
        return ordered.select(
            F.lit(None).cast("long").alias(start_col), *keep_cols)
    mapping = F.create_map(*offsets)
    # materialize (pid, mid) in ONE projection below the window's
    # exchange: the nondeterministic mid is assigned in checkpointed-
    # partition iteration order, then the window re-clusters by pid
    mid = F.monotonically_increasing_id()
    tagged = ordered.select(
        F.shiftrightunsigned(mid, 33).alias("_pid"),
        mid.bitwiseAND(F.lit((1 << 33) - 1)).alias("_rid"),
        "_w", *keep_cols)
    w = (Window.partitionBy("_pid").orderBy("_rid")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = mapping[F.col("_pid")] + F.sum("_w").over(w) - F.col("_w")
    return tagged.select(start.alias(start_col), *keep_cols)


def _perm_by(v: DataFrame, order_cols: list) -> DataFrame:
    """Distributed total-order -> (pos, id) permutation — the Spark form
    of MemoryEfficientPSort (SpParHelper.h:69): no single-partition
    window, no Python stage (see zip_with_index)."""
    return zip_with_index(v, order_cols, ["id"])


def sort_perm(v: DataFrame, ascending: bool = True) -> DataFrame:
    """Distributed vector sort returning the sorting permutation
    (FullyDistVec::sort, FullyDistVec.cpp:747): (pos, id) such that
    v[id] ranks at position pos under (val, id) order."""
    key = F.col("val").asc() if ascending else F.col("val").desc()
    cols = ([key, F.col("id").asc()] if "val" in v.columns else [F.col("id").asc()])
    return _perm_by(v, cols)


def rand_perm(v: DataFrame, seed: int = 42) -> DataFrame:
    """Seeded random permutation (FullyDistVec::RandPerm,
    FullyDistVec.cpp:784): returns (pos, id) mapping. Used for load
    balancing (CC.cpp:161-171). Deterministic under a fixed seed via
    md5 ordering rather than rand() so resume replays identically AND
    an ANSI-SQL oracle can reproduce it (md5 exists everywhere)."""
    h = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("id").cast("string")).cast("binary"))
    return _perm_by(v.select("id", h.alias("_h")), [F.col("_h").asc(), F.col("id").asc()])


def uniq(v: DataFrame, combine=F.min) -> DataFrame:
    """Distinct values with a combiner on ids (FullyDistSpVec::Uniq,
    FullyDistSpVec.cpp:890): keeps one (id,val) per distinct val."""
    return (
        v.groupBy("val").agg(combine(F.col("id")).alias("id")).select("id", "val")
    )


def setminus(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sparse-vector set difference on ids (FullyDistSpVec::Setminus,
    FullyDistSpVec.h:96-107)."""
    return a.join(b.select("id"), "id", "left_anti")


def concatenate(vecs: list[DataFrame]) -> DataFrame:
    """Stack vectors with id offsets (Concatenate, ParFriends.h:61-159).
    Empty vectors contribute length 0 (max(id) is NULL — review r4:
    int(None) used to raise); an empty list is a usage error."""
    if not vecs:
        raise ValueError("concatenate: empty vector list")
    out = None
    offset = 0
    for v in vecs:
        n = v.agg(F.max("id")).collect()[0][0]
        shifted = v.select((F.col("id") + F.lit(offset)).alias("id"), F.col("val"))
        out = shifted if out is None else out.unionByName(shifted)
        offset += int(n) + 1 if n is not None else 0
    return out


def find(edges: DataFrame) -> DataFrame:
    """Matrix -> (I,J,V) triples (SpParMat::Find, SpParMat.cpp:4773).
    Identity here: the edge DataFrame already IS the triples."""
    return edges


def induced_subgraphs(edges: DataFrame, assign: DataFrame) -> DataFrame:
    """Partition a graph by a vertex->group assignment, keeping edges
    whose endpoints share a group (InducedSubgraphs2Procs, SpParMat.h:108;
    ReleaseTests/InducedSubgraphsTest.cpp). assign: (id, val=group)."""
    s = assign.select(F.col("id").alias("src"), F.col("val").alias("_gs"))
    d = assign.select(F.col("id").alias("dst"), F.col("val").alias("_gd"))
    return (
        edges.join(s, "src").join(d, "dst")
        .filter(F.col("_gs") == F.col("_gd"))
        .select(*edges.columns, F.col("_gs").alias("group"))
    )
