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


def multi_source_levels(
    edges: DataFrame,
    roots: list[int] | None = None,
    directed: bool = True,
) -> DataFrame:
    """Batched multi-root BFS levels: one (root, id, level) row per
    (root, reached vertex) — the wave loop shared by
    closeness_centrality and landmark_distances (identical shape to
    betweenness's forward pass; all roots' waves ride ONE join +
    dedup + anti-join per depth). roots=None starts a wave from every
    vertex."""
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select("src", "dst").dropDuplicates(["src", "dst"])
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).dropDuplicates(["src", "dst"])
    e = e.repartition(shuffle_n, "src").persist(StorageLevel.MEMORY_AND_DISK)
    e.count()

    if roots is None:
        fr0 = vertices(edges).select(F.col("id").alias("root"), F.col("id"))
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
    e.unpersist()
    return levels


def closeness_centrality(
    edges: DataFrame,
    roots: list[int] | None = None,
    directed: bool = True,
) -> DataFrame:
    """Returns (id, harmonic, closeness) for every root (roots=None ->
    every vertex; exact centrality)."""
    verts = vertices(edges).localCheckpoint(eager=True)
    if roots is None:
        fr0 = verts.select(F.col("id").alias("root"), F.col("id"))
    else:
        fr0 = edges.sparkSession.createDataFrame(
            [(int(r), int(r)) for r in roots], "root long, id long")
    levels = multi_source_levels(edges, roots, directed)

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


def landmark_distances(
    edges: DataFrame,
    n_landmarks: int = 4,
    directed: bool = False,
) -> DataFrame:
    """Landmark distance sketch (Potamias et al. CIKM'09): BFS levels
    from the ``n_landmarks`` highest-degree vertices (degree-ranked
    selection is the paper's best practical heuristic; ties to the
    smaller id) — the precomputed table behind constant-time
    point-to-point distance ESTIMATION on web graphs, where exact
    all-pairs is out of the question. Returns (lm, id, dist) for every
    vertex reached from each landmark.

    Scale shape: landmark pick = TakeOrdered over the degree aggregate
    (n rows to the driver — the same sanctioned scalar read as BFS
    roots); then ONE batched multi-root BFS (all landmarks' waves ride
    the same join per depth — multi_source_levels). Sketch size is
    n_landmarks x |V| rows, the product you materialize and
    equi-join at query time.
    """
    if n_landmarks < 1:
        raise ValueError(
            f"landmark_distances: n_landmarks must be >= 1, got {n_landmarks}")
    pairs = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    sym = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("c"))
    lms = [r["id"] for r in
           deg.orderBy(F.desc("c"), F.asc("id")).limit(n_landmarks).collect()]
    levels = multi_source_levels(edges, lms, directed=directed)
    return levels.select(F.col("root").alias("lm"), "id",
                         F.col("level").cast("long").alias("dist"))


def landmark_estimate(sketch: DataFrame, max_id: int | None = None) -> DataFrame:
    """Point-to-point distance estimates from a landmark sketch:
    est(u, v) = min over landmarks (dist(u, lm) + dist(lm, v)) — an
    UPPER bound on the true distance (exact when a shortest path
    passes a landmark, or an endpoint is one). ``max_id`` bounds the
    query set (id_a < id_b <= max_id) so the output is pair-sized, the
    caller's query-batch pattern. Returns (id_a, id_b, est).

    Scale shape: one self-equi-join of the (pre-filtered) sketch on
    the landmark key + a map-side-combinable min — never touches the
    graph again; that is the whole point of the sketch.
    """
    s = sketch if max_id is None else sketch.where(F.col("id") <= max_id)
    a = s.select("lm", F.col("id").alias("id_a"), F.col("dist").alias("_da"))
    b = s.select("lm", F.col("id").alias("id_b"), F.col("dist").alias("_db"))
    return (
        a.join(b, "lm")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.min(F.col("_da") + F.col("_db")).cast("long").alias("est"))
    )
