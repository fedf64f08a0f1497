"""PageRank — semiring PlusTimes SpMV with damping + dangling mass.

Not implemented in CombBLAS core (only in the bundled third-party
comparison code Applications/CC_ipdps18/HPCGraph/0.1/pagerank.cpp); the
north rule requires it. Expressed as the classic power iteration:

    r' = (1-a)/n + a * ( A_norm^T r + dangling_mass/n )

where A_norm has each row divided by its out-degree. One SpMV
(join + groupBy-sum) per superstep; the dangling-mass scalar is an
aggregate collect (the driver-side analogue of MPI_Allreduce).

Scale design (100 TB / 10^12 docs):
* edges are joined with out-degrees ONCE, pre-repartitioned by the join
  key (src) and persisted — per superstep only the small rank vector
  shuffles to meet them (the analogue of SUMMA re-using the block
  distribution across stages).
* the groupBy(dst).sum is THE communication step; Spark's map-side
  partial aggregation absorbs in-degree skew (hub pages) exactly like
  the reference's tree-reduce; AQE skew-join covers the join side.
* lineage is truncated every ``checkpoint_interval`` supersteps via
  localCheckpoint (durable parquet checkpoints live in plans.superstep).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from combblas_spark.graph import vertices


def pagerank(
    edges: DataFrame,
    alpha: float = 0.85,
    n_iter: int | None = None,
    tol: float | None = 1e-8,
    max_iter: int = 100,
    checkpoint_interval: int = 5,
    weighted: bool = False,
    metrics: list | None = None,
) -> DataFrame:
    """Returns (id, rank) over the vertex set src UNION dst.

    n_iter set -> EXACTLY that many synchronous iterations (used by the
    DuckDB oracle, which unrolls the same recurrence); tol set -> run to
    L1 convergence (used by correctness-vs-numpy tests and bench).
    """
    spark = edges.sparkSession
    sc = spark.sparkContext

    verts = vertices(edges).persist(StorageLevel.MEMORY_AND_DISK)
    n = verts.count()

    w = F.col("val") if weighted and "val" in edges.columns else F.lit(1.0)
    outw = edges.groupBy("src").agg(F.sum(w).alias("_outw"))
    # Normalized transition edges, partitioned by the per-superstep join
    # key so the big side never re-shuffles inside the loop.
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    enorm = (
        edges.join(outw, "src")
        .select("src", "dst", (w / F.col("_outw")).alias("w"))
        .repartition(shuffle_n, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    enorm.count()

    # Dangling vertices: appear as dst but have no out-edges.
    dangling = verts.join(edges.select("src").distinct(),
                          verts["id"] == F.col("src"), "left_anti").select("id")
    dangling = dangling.persist(StorageLevel.MEMORY_AND_DISK)
    dangling.count()

    ranks = verts.select("id", F.lit(1.0 / n).alias("rank")).persist()
    ranks.count()

    iters = n_iter if n_iter is not None else max_iter
    for it in range(iters):
        dmass = (
            ranks.join(dangling, "id", "left_semi").agg(F.sum("rank")).collect()[0][0]
            or 0.0
        )
        inflow = (
            enorm.join(ranks, enorm["src"] == ranks["id"], "inner")
            .select(F.col("dst").alias("id"), (F.col("w") * F.col("rank")).alias("_c"))
            .groupBy("id")
            .agg(F.sum("_c").alias("_in"))
        )
        new_ranks = (
            verts.join(inflow, "id", "left")
            .select(
                "id",
                (
                    F.lit((1.0 - alpha) / n)
                    + F.lit(alpha) * (F.coalesce(F.col("_in"), F.lit(0.0)) + F.lit(dmass / n))
                ).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_interval == 0:
            new_ranks = new_ranks.localCheckpoint(eager=False)
        new_ranks = new_ranks.persist()

        if n_iter is None and tol is not None:
            delta = (
                new_ranks.join(ranks.withColumnRenamed("rank", "_old"), "id")
                .agg(F.sum(F.abs(F.col("rank") - F.col("_old"))).alias("d"))
                .collect()[0]["d"]
            )
            ranks.unpersist()
            ranks = new_ranks
            if metrics is not None:
                metrics.append({"iter": it, "l1_delta": delta, "dangling_mass": dmass})
            if delta < tol:
                break
        else:
            new_ranks.count()
            ranks.unpersist()
            ranks = new_ranks
            if metrics is not None:
                metrics.append({"iter": it, "dangling_mass": dmass})

    enorm.unpersist()
    dangling.unpersist()
    verts.unpersist()
    return ranks
