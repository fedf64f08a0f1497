"""Power iteration clustering (Lin & Cohen, ICML 2010).

Spectral-quality clustering without an eigensolver: run a few steps of
the row-normalized random-walk operator W = D^-1 A on a vector and
cluster the 1-D embedding it converges THROUGH (the early iterates mix
the top eigenvectors with weights that separate clusters; full
convergence would collapse to the constant vector, which is why the
iteration count is a feature, not a tolerance).

Reference parity: the iteration is the same SpMV superstep as
PageRank/Katz (semiring +,* with a per-row 1/deg scale — DimApply in
the reference, SpParMat::DimApply + SpMV); the novelty is the gap-split
readout, which CombBLAS has no analogue for (clustering there is MCL).

Scale design:
- Each superstep: one edge join + map-side-combinable sum + vertex-
  sized stitch — identical traffic to one PageRank superstep.
- The readout needs a TOTAL order over the vertex embedding: done with
  the distributed JVM zip_with_index (range-partitioned sort), NEVER a
  single-partition window; consecutive-gap pairs come from one
  self-equi-join on pos, and the k-1 boundary gaps are a driver-side
  top-k over a vertex-sized frame (TakeOrderedAndProject, k tiny).
- Cluster ids are relabeled to the cluster's minimum vertex id (the
  CC/FastSV labeling convention) so output is partition-invariant.

Float contract: the embedding is rounded to 9dp BEFORE the sort/gap
stage (both engines apply the identical rounding), so the order and
the gap ranking are decided on the rounded values; the oracle unrolls
the same iteration with literally the same expression order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from combblas_spark.portable import pround

from combblas_spark.runtime.plans import superstep_checkpoint


def power_iteration_clustering(
    edges: DataFrame,
    k: int = 4,
    n_iter: int = 6,
) -> DataFrame:
    """Cluster the undirected simple graph underlying ``edges`` into at
    most ``k`` clusters: returns (id, cluster, emb) where ``cluster``
    is the minimum vertex id of the cluster and ``emb`` the final
    9dp-rounded PIC embedding value.

    v_0 = d(v) / vol(G);  v_{t+1} = (D^-1 A v_t) / ||D^-1 A v_t||_1;
    after ``n_iter`` steps sort vertices by (emb, id) and cut at the
    k-1 largest strictly-positive consecutive gaps (ties broken by
    lower embedding, then lower id — fully deterministic). Fewer
    positive gaps than k-1 yields fewer clusters.
    """
    if k < 1:
        raise ValueError(f"power_iteration_clustering: k must be >= 1, got {k}")
    if n_iter < 1:
        raise ValueError(
            f"power_iteration_clustering: n_iter must be >= 1, got {n_iter}")
    from combblas_spark.operators.indexing import zip_with_index

    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))

    und = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    sym = (
        und.select(F.least("src", "dst").alias("u"),
                   F.greatest("src", "dst").alias("v"))
        .dropDuplicates(["u", "v"])
    )
    adj = (
        sym.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(sym.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .repartition(shuffle_n, "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = adj.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg"))
    deg = deg.persist(StorageLevel.MEMORY_AND_DISK)
    vol = deg.agg(F.sum("deg").alias("_vol"))
    x = (
        deg.crossJoin(F.broadcast(vol))
        .select("id", (F.col("deg").cast("double") / F.col("_vol")).alias("x"))
        .localCheckpoint(eager=True)
    )
    for t in range(n_iter):
        xv = x.select(F.col("id").alias("src"), F.col("x").alias("_x"))
        inflow = (
            adj.join(xv, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("_x").alias("_in"))
        )
        raw = deg.join(inflow, "id").select(
            "id", (F.col("_in") / F.col("deg")).alias("_r"))
        tot = raw.agg(F.sum("_r").alias("_t"))
        x = superstep_checkpoint(
            raw.crossJoin(F.broadcast(tot))
            .select("id", (F.col("_r") / F.col("_t")).alias("x")),
            t,
        )

    emb = x.select("id", pround("x", 9).alias("emb"))
    pos = zip_with_index(emb, ["emb", "id"], ["emb", "id"], pos_col="pos") \
        .localCheckpoint(eager=True)
    nxt = pos.select((F.col("pos") - 1).alias("pos"),
                     F.col("emb").alias("_e2"))
    gaps = pos.join(nxt, "pos").select(
        "pos", (F.col("_e2") - F.col("emb")).alias("gap"))
    bounds = (
        gaps.where(F.col("gap") > 0)
        .orderBy(F.col("gap").desc(), F.col("pos").asc())
        .limit(k - 1)
        .select(F.col("pos").alias("bpos"))
    )
    cl = (
        pos.join(F.broadcast(bounds),
                 pos["pos"] > F.col("bpos"), "left")
        .groupBy("id", "emb", "pos")
        .agg(F.count("bpos").alias("_c"))
    )
    label = cl.groupBy("_c").agg(F.min("id").alias("cluster"))
    out = cl.join(label, "_c").select("id", "cluster", "emb") \
        .localCheckpoint(eager=True)
    adj.unpersist()
    deg.unpersist()
    return out
