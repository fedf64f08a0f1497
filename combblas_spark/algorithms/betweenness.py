"""Betweenness centrality — batched Brandes (Applications/BetwCent.cpp).

The reference processes ``batchSize`` source vertices at once: the
fringe is an n x batch matrix advanced by SpGEMM (BetwCent.cpp:155-218),
path counts accumulate in ``nsp``, and the backward pass applies the
dependency update  delta[v] += sigma[v]/sigma[w] * (1 + delta[w])  via
EWiseMult/EWiseScale into a dense accumulator ``bcu``.

Spark form: the n x batch fringe is a DataFrame keyed (root, id) — the
batch dimension is just a second key column, so one join advances ALL
roots' BFS waves at once (the exact analogue of the batched SpGEMM).
Unweighted shortest paths (BFS), like the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from combblas_spark.graph import symmetrize_partitioned, vertices
from combblas_spark.runtime.plans import superstep_checkpoint


def betweenness_centrality(
    edges: DataFrame,
    roots: list[int] | None = None,
    directed: bool = False,
    normalize: bool = False,
    dual_layout: bool = False,
) -> DataFrame:
    """Returns (id, bc). roots=None uses every vertex as a source (exact
    BC, small graphs); pass a subset for the reference's sampled/batched
    mode (BetwCent.cpp batchSize x nBatches).

    dual_layout: the forward wave joins edges on src, the backward
    dependency pass joins them on dst (w) — two aggregation dimensions,
    so on paper the HITS trade (hits.py) applies: a second
    dst-partitioned copy spares the backward levels an edge-sized
    exchange. MEASURED AND LEFT OFF BY DEFAULT (scripts/
    betweenness_bench.py, BENCH.md): at RMAT-16 local[32] the A/B gives
    0.89x/1.06x/0.95x at 64/128/256 roots — parity within host noise —
    because the per-level set is broadcastable (the edge side is never
    exchanged) and the backward wall is dominated by the (root, id)
    expansion, unlike HITS where a dense n-vector meets the edge cache
    every half-step. Placement-only: results are identical either way."""
    spark = edges.sparkSession
    shuffle_n = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # directed mode must dedup parallel (src,dst) rows too — the
    # undirected path gets that from symmetrize_partitioned, and
    # duplicate rows inflate sigma path counts (review r4)
    e = (edges.select("src", "dst").dropDuplicates(["src", "dst"])
         .repartition(shuffle_n, "src") if directed
         else symmetrize_partitioned(edges, "src", shuffle_n).select("src", "dst"))
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    if dual_layout:
        e_w = e.repartition(shuffle_n, "dst").persist(StorageLevel.MEMORY_AND_DISK)
        e_w.count()
    else:
        e_w = e
    # checkpoint: verts is referenced by the source frontier (roots=None),
    # the final bc stitch, and the normalize count — one distinct, not three
    verts = vertices(edges).localCheckpoint(eager=True)

    if roots is None:
        fr0 = verts.select(F.col("id").alias("root"), F.col("id"), F.lit(1.0).alias("sigma"))
    else:
        fr0 = spark.createDataFrame(
            [(int(r), int(r), 1.0) for r in roots], "root long, id long, sigma double"
        )

    # ---- forward: level-synchronous batched BFS with path counting
    levels = fr0.withColumn("level", F.lit(0)).localCheckpoint(eager=True)
    frontier = levels
    depth = 0
    while True:
        nxt = (
            e.join(frontier.withColumnRenamed("id", "src"), "src")
            .groupBy("root", F.col("dst").alias("id"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(levels.select("root", "id"), ["root", "id"], "left_anti")
            .withColumn("level", F.lit(depth + 1))
        )
        nxt = superstep_checkpoint(nxt, depth)
        if nxt.isEmpty():
            break
        levels = levels.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
        depth += 1

    # ---- backward: dependency accumulation from the deepest level up
    delta = None  # (root, id, delta)
    for lvl in range(depth, 0, -1):
        wset = levels.filter(F.col("level") == lvl).select(
            "root", F.col("id").alias("w"), F.col("sigma").alias("sig_w"))
        if delta is not None:
            wset = (
                wset.join(delta.withColumnsRenamed({"id": "w", "delta": "d_w"}),
                          ["root", "w"], "left")
                .select("root", "w", "sig_w", F.coalesce(F.col("d_w"), F.lit(0.0)).alias("d_w"))
            )
        else:
            wset = wset.withColumn("d_w", F.lit(0.0))
        preds = levels.filter(F.col("level") == lvl - 1).select(
            "root", F.col("id").alias("v"), F.col("sigma").alias("sig_v"))
        contrib = (
            e_w.select(F.col("src").alias("v"), F.col("dst").alias("w"))
            .join(wset, "w")
            .join(preds, ["root", "v"])
            .select("root", F.col("v").alias("id"),
                    (F.col("sig_v") / F.col("sig_w") * (1.0 + F.col("d_w"))).alias("_c"))
            .groupBy("root", "id")
            .agg(F.sum("_c").alias("delta_new"))
        )
        if delta is None:
            delta = contrib.withColumnRenamed("delta_new", "delta")
        else:
            delta = (
                delta.join(contrib, ["root", "id"], "full_outer")
                .select("root", "id",
                        (F.coalesce(F.col("delta"), F.lit(0.0))
                         + F.coalesce(F.col("delta_new"), F.lit(0.0))).alias("delta"))
            )
        delta = superstep_checkpoint(delta, depth - lvl)

    e.unpersist()
    if dual_layout:
        e_w.unpersist()
    if delta is None:
        return verts.select("id", F.lit(0.0).alias("bc"))
    bc = (
        delta.filter(F.col("id") != F.col("root"))
        .groupBy("id")
        .agg(F.sum("delta").alias("bc"))
    )
    out = verts.join(bc, "id", "left").select("id", F.coalesce("bc", F.lit(0.0)).alias("bc"))
    if not directed:
        out = out.select("id", (F.col("bc") / 2.0).alias("bc"))
    if normalize:
        n = verts.count()
        if n > 2:  # (n-1)(n-2) = 0 below that: bc is all-zero, leave it
            denom = (n - 1) * (n - 2) / (2.0 if not directed else 1.0)
            out = out.select("id", (F.col("bc") / F.lit(denom)).alias("bc"))
    return out
