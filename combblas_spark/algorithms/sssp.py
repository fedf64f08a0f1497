"""Single-source shortest paths — Bellman-Ford over the MinPlus
(tropical) semiring.

The reference ships MinPlusSRing (include/CombBLAS/Semirings.h:236-255)
exactly for this classic CombBLAS use:  dist' = dist min.+ (A^T dist).
Each superstep is one SpMV over MIN_PLUS merged with the previous
distances via a groupBy-min (the same union-agg shape as FastSV in
components.py). A frontier optimization keeps the SpMV sparse: only
vertices whose distance improved last superstep propagate (SpMSpV,
ParFriends.h:2180 — the sparse-vector path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from combblas_spark.runtime.plans import superstep_checkpoint


def sssp(
    edges: DataFrame,
    root: int,
    weighted: bool = True,
    max_iter: int = 60,
    directed: bool = True,
    metrics: list | None = None,
    runner=None,
    broadcast_max_vertices: int = 8_000_000,
) -> DataFrame:
    """Returns (id, dist) for vertices reachable from ``root``.

    edges: (src, dst, val>0); val is the edge weight (1.0 if
    weighted=False). Distances follow edge direction src->dst unless
    directed=False (symmetrized first).

    The frontier is broadcast into the relax join only while it holds at
    most ``broadcast_max_vertices`` rows (same gate as pagerank /
    components); above that — near-diameter steps on dense graphs, or a
    resume where the frontier is the whole distance vector — it falls
    back to a shuffle join against the dst-partitioned cached edges.
    """
    spark = edges.sparkSession
    w = F.col("val") if weighted and "val" in edges.columns else F.lit(1.0)
    e = edges.select("src", "dst", w.alias("w"))
    if not directed:
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w"))
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = e.repartition(shuffle_n, "dst").persist(StorageLevel.MEMORY_AND_DISK)
    e.count()

    start_it = 0
    dist = None
    if runner is not None:
        resumed = runner.resume()
        if resumed is not None:
            # state = the distance vector; the frontier is not persisted —
            # resume re-relaxes from ALL current distances once (a safe
            # over-approximation: extra relaxations are monotone no-ops)
            start_it, dist = resumed
    if dist is None:
        dist = spark.createDataFrame([(int(root), 0.0)], "id long, dist double")
    dist = dist.localCheckpoint(eager=True)
    frontier = dist  # vertices improved last superstep
    n_front = frontier.count()

    for it in range(start_it, max_iter):
        # SpMSpV over MinPlus: relax out-edges of the frontier only.
        # Broadcast only while the frontier is provably small.
        f_in = (F.broadcast(frontier) if n_front <= broadcast_max_vertices
                else frontier)
        relaxed = (
            e.join(f_in.withColumnRenamed("id", "_fid"),
                   e["src"] == F.col("_fid"))
            .select(F.col("dst").alias("id"), (F.col("w") + F.col("dist")).alias("dist"))
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
        )
        merged = (
            dist.unionByName(relaxed)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
        )
        if runner is not None:
            merged = runner.step(it, merged)
        else:
            merged = superstep_checkpoint(merged, it)
        # improved = strictly better than before (new vertices included)
        frontier = (
            merged.join(dist.withColumnRenamed("dist", "_old"), "id", "left")
            .filter(F.col("_old").isNull() | (F.col("dist") < F.col("_old")))
            .select("id", "dist")
            .localCheckpoint(eager=True)
        )
        n_front = frontier.count()  # convergence check + next broadcast gate
        if metrics is not None:
            metrics.append({"iter": it, "frontier": n_front})
        dist = merged
        if n_front == 0:
            break

    if n_front > 0:
        # max_iter exhausted with an active frontier: the returned
        # vector is the exact ``max_iter``-hop Bellman-Ford relaxation —
        # a well-defined partial state (it is what runner-based resume
        # feeds back in), but NOT the shortest-path fixpoint, so say so
        # loudly instead of returning it silently (ADVICE-r3 pattern).
        import warnings

        warnings.warn(
            f"sssp: frontier still has {n_front} improving vertices "
            f"after max_iter={max_iter} supersteps; distances are the "
            f"{max_iter}-hop relaxation, not the fixpoint — raise "
            f"max_iter (graph has longer shortest paths)",
            RuntimeWarning, stacklevel=2)
    if runner is not None:
        runner.finish(dist)
    e.unpersist()
    return dist
