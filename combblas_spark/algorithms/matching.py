"""Bipartite maximal matching — round-synchronous greedy proposals.

Reference: BPMaximalMatching.h:24 (MaximalMatching with GREEDY init;
the MPI code alternates SpMV-like "request" and "grant" phases over the
bipartite adjacency). Spark form, per round over the LIVE edge set
(both endpoints unmatched):

    propose : each live row proposes to the live neighbor minimizing a
              seeded md5 edge priority (one groupBy min_by)
    grant   : each column accepts the proposing row with the minimum
              edge priority (one groupBy min_by)
    commit  : accepted pairs join the matching; their endpoints leave
              the live set (two anti-joins)

The md5 edge priority is the Luby trick (same role as the random
priorities in mis.py): min-ID priorities would funnel every row's
proposal onto the few lowest column ids and serialize convergence,
while a hash priority spreads proposals uniformly, so the live set
shrinks geometrically — O(log n) rounds. It is also deterministic and
ANSI-SQL-expressible, so the final matching has an exact unrolled-SQL
twin (the same technique as the BFS/MCL oracles). Each round is
edge-sized work with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from combblas_spark.runtime.plans import superstep_checkpoint


def bipartite_maximal_matching(
    edges: DataFrame,
    max_iter: int = 64,
    metrics: list | None = None,
) -> DataFrame:
    """Returns matched (src, dst) pairs: a valid MAXIMAL matching of the
    bipartite graph whose row side is ``src`` and column side ``dst``
    (ids live in separate namespaces; equal ids on the two sides are
    distinct vertices, as in the reference's rectangular SpParMat).
    """
    spark = edges.sparkSession
    prio = F.md5(F.concat_ws(
        ":", F.col("src").cast("string"), F.col("dst").cast("string")).cast("binary"))
    live = (
        edges.select("src", "dst").distinct()
        .withColumn("h", prio)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    live.count()

    matched = spark.createDataFrame([], "src long, dst long")
    for it in range(max_iter):
        proposals = live.groupBy("src").agg(
            F.min_by("dst", F.col("h")).alias("dst"),
            F.min("h").alias("h"))
        grants = (
            proposals.groupBy("dst").agg(F.min_by("src", F.col("h")).alias("src"))
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        n_new = grants.count()
        if metrics is not None:
            metrics.append({"iter": it, "granted": n_new})
        if n_new == 0:
            break
        matched = matched.unionByName(grants).localCheckpoint(eager=True)
        nxt = (
            live.join(grants.select("src"), "src", "left_anti")
            .join(grants.select("dst"), "dst", "left_anti")
            .select("src", "dst", "h")
        )
        nxt = superstep_checkpoint(nxt, it)
        live.unpersist()
        live = nxt
        if live.isEmpty():
            break
    live.unpersist()
    return matched
