"""Closeness / harmonic centrality — batched multi-root BFS.

The distance-based centrality pair next to betweenness (same batched
level-synchronous forward pass as betweenness.py, minus path counts):
for each root r over directed distances d(r, v),

    harmonic(r)  = sum_{v reachable, v != r} 1 / d(r, v)
    closeness(r) = reached(r) / sum d(r, v)     (0 when nothing reached)

Harmonic is the variant that stays well-defined on disconnected
webgraphs (Boldi & Vigna 2014 recommend it for exactly that reason);
the closeness column uses the reached-count numerator so partial
reachability does not inflate scores.

Scale: the batch dimension is a key column — one join advances all
roots' waves (identical shape to betweenness's forward pass); the
final score is one groupBy(root) over the accumulated level table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from combblas_spark.graph import vertices
from combblas_spark.runtime.plans import superstep_checkpoint


def closeness_centrality(
    edges: DataFrame,
    roots: list[int] | None = None,
    directed: bool = True,
) -> DataFrame:
    """Returns (id, harmonic, closeness) for every root (roots=None ->
    every vertex; exact centrality)."""
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select("src", "dst").dropDuplicates(["src", "dst"])
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).dropDuplicates(["src", "dst"])
    e = e.repartition(shuffle_n, "src").persist(StorageLevel.MEMORY_AND_DISK)
    e.count()

    verts = vertices(edges).localCheckpoint(eager=True)
    if roots is None:
        fr0 = verts.select(F.col("id").alias("root"), F.col("id"))
    else:
        fr0 = spark.createDataFrame(
            [(int(r), int(r)) for r in roots], "root long, id long")

    levels = fr0.withColumn("level", F.lit(0)).localCheckpoint(eager=True)
    frontier = levels
    depth = 0
    while True:
        nxt = (
            e.join(frontier.withColumnRenamed("id", "src"), "src")
            .select("root", F.col("dst").alias("id"))
            .dropDuplicates(["root", "id"])
            .join(levels.select("root", "id"), ["root", "id"], "left_anti")
            .withColumn("level", F.lit(depth + 1))
        )
        nxt = superstep_checkpoint(nxt, depth)
        if nxt.isEmpty():
            break
        levels = levels.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
        depth += 1

    scores = (
        levels.groupBy("root")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("level") > 0, F.lit(1.0) / F.col("level"))),
                F.lit(0.0)).alias("harmonic"),
            F.sum("level").alias("_sumd"),
            F.count(F.when(F.col("level") > 0, F.lit(1))).alias("_reached"),
        )
        .select(
            F.col("root").alias("id"),
            "harmonic",
            F.when(F.col("_sumd") > 0,
                   F.col("_reached").cast("double") / F.col("_sumd"))
            .otherwise(F.lit(0.0)).alias("closeness"),
        )
    )
    # one row per COMPUTED root only: with a roots subset, zero-filling
    # the rest of the vertex set would make "never computed" look like a
    # real 0.0 score; an off-graph root still gets its (0, 0) row.
    base = (verts if roots is None
            else fr0.select(F.col("root").alias("id")).dropDuplicates(["id"]))
    out = base.join(scores, "id", "left").select(
        "id",
        F.coalesce("harmonic", F.lit(0.0)).alias("harmonic"),
        F.coalesce("closeness", F.lit(0.0)).alias("closeness"),
    )
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    return out


def diameter_double_sweep(edges: DataFrame) -> DataFrame:
    """Double-sweep diameter lower bound (Magnien, Latapy & Habib 2009):
    BFS from a fixed start (the minimum vertex id), then BFS again from
    the farthest vertex found (max level, min-id tie-break). Returns ONE
    row (root, far_id, ecc_root, diameter_lb) where diameter_lb is the
    second sweep's eccentricity — in practice within a few percent of
    the true undirected diameter at a cost of exactly 2 BFS runs
    (the exact diameter is all-pairs; the ANF/HyperBall sketches in
    anf.py give the effective-diameter ESTIMATE, this gives the exact
    LOWER BOUND — the standard companion pair).

    Scale shape: two level-synchronous BFS supersteps (the engine's
    existing bfs_levels loop — frontier-sized traffic per level) plus
    two 1-row driver reads (the start id and the farthest id — scalar
    convergence reads, the documented exception to no-collect).
    """
    from combblas_spark.algorithms.bfs import bfs_levels
    from combblas_spark.graph import vertices

    spark = edges.sparkSession
    v0 = vertices(edges).agg(F.min("id").alias("m")).collect()[0]["m"]
    if v0 is None:
        return spark.createDataFrame(
            [], "root long, far_id long, ecc_root long, diameter_lb long")
    l1 = bfs_levels(edges, int(v0), directed=False)
    far = (
        l1.orderBy(F.col("level").desc(), F.col("id").asc())
        .select("id", "level").limit(1).collect()[0]
    )
    l2 = bfs_levels(edges, int(far["id"]), directed=False)
    return (
        l2.agg(F.max("level").alias("diameter_lb"))
        .select(
            # explicit longs: F.lit(int) types by magnitude, and the
            # empty-input branch declares long — keep one schema
            F.lit(int(v0)).cast("long").alias("root"),
            F.lit(int(far["id"])).cast("long").alias("far_id"),
            F.lit(int(far["level"])).cast("long").alias("ecc_root"),
            F.col("diameter_lb").cast("long").alias("diameter_lb"),
        )
    )
