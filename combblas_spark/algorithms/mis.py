"""Maximal independent set — Luby's algorithm (FilteredMIS parity,
Applications/FilteredMIS.cpp: the reference runs MIS through
semantically-filtered SpMV; here the per-round structure is the classic
Luby round expressed as two joins).

Per round over the remaining candidate vertices:
  1. every candidate gets a deterministic pseudo-random priority
     (md5("seed:round:id") — seeded, partition-invariant, resume-
     stable, and ANSI-SQL-expressible so the driver oracle can replay
     the rounds exactly);
  2. a candidate enters the MIS iff its priority is a strict local
     minimum among its remaining neighbors (min-neighbor-priority via
     one groupBy-min = an SpMV over the Select2ndMin semiring);
  3. winners and their neighbors leave the candidate set.
Terminates in O(log n) rounds w.h.p.; the result is verified
independent AND maximal in tests (property check — the algorithm's
contract, mirroring the reference's Correctness() style checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from combblas_spark.graph import symmetrize_partitioned, vertices
from combblas_spark.runtime.plans import superstep_checkpoint


def maximal_independent_set(
    edges: DataFrame,
    seed: int = 42,
    max_iter: int = 60,
    metrics: list | None = None,
) -> DataFrame:
    """Returns (id) — a maximal independent set of the undirected view.

    Isolated vertices (no edges) are always in the MIS. Self-loops are
    IGNORED (a vertex is not its own neighbor): left in, a loop vertex
    would see its own priority as a neighbor minimum, never win a
    round, and the run would falsely exhaust max_iter.
    """
    # src-partitioned in the same single exchange the dedup costs anyway:
    # every round's sym-join on src then reads the cache without a shuffle
    shuffle_n = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    sym = (symmetrize_partitioned(edges, "src", shuffle_n)
           .filter(F.col("src") != F.col("dst"))
           .select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK))
    sym.count()

    cand = vertices(edges).localCheckpoint(eager=True)
    spark = edges.sparkSession
    mis = spark.createDataFrame([], "id long")

    try:
        for it in range(max_iter):
            n_cand = cand.count()
            if n_cand == 0:
                break
            pri = cand.select("id", F.md5(F.concat_ws(
                ":", F.lit(str(seed)), F.lit(str(it)),
                F.col("id").cast("string")).cast("binary")).alias("p"))
            # min neighbor priority among REMAINING candidates (edges with
            # both ends still candidate)
            live = (
                sym.join(pri.withColumnsRenamed({"id": "src", "p": "_ps"}), "src")
                .join(pri.select(F.col("id").alias("dst")), "dst", "left_semi")
            )
            nbr_min = live.groupBy(F.col("dst").alias("id")).agg(F.min("_ps").alias("_np"))
            winners = (
                pri.join(nbr_min, "id", "left")
                .filter(F.col("_np").isNull() | (F.col("p") < F.col("_np")))
                .select("id")
                .localCheckpoint(eager=True)
            )
            # remove winners and their neighbors from the candidate set.
            # No distinct: dead only feeds a left_anti join, whose result is
            # identical with duplicates on the right — the dedup would cost
            # an extra shuffle per round.
            dead = winners.unionByName(
                sym.join(winners.withColumnRenamed("id", "src"), "src")
                .select(F.col("dst").alias("id"))
            )
            mis = mis.unionByName(winners).localCheckpoint(eager=True)
            cand = superstep_checkpoint(cand.join(dead, "id", "left_anti"), it)
            if metrics is not None:
                metrics.append({"iter": it, "candidates": n_cand})
        else:
            if not cand.isEmpty():
                # returning here would violate the MAXIMALITY contract
                # silently (the set is independent but candidates remain
                # unexamined) — non-convergence must be loud (ADVICE-r3
                # pattern). Luby needs O(log n) rounds w.h.p., so hitting
                # 60 means something is genuinely wrong.
                raise RuntimeError(
                    f"maximal_independent_set: candidates remain after "
                    f"max_iter={max_iter} Luby rounds; raise max_iter")

    finally:
        # unpersist on the raise path too — loud-failure tests run in a
        # shared session and must not accumulate dead caches
        sym.unpersist()
    return mis
