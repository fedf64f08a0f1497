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


def bipartite_maximum_matching(
    edges: DataFrame,
    max_phases: int | None = None,
    max_depth: int = 32,
    metrics: list | None = None,
) -> DataFrame:
    """MAXIMUM-cardinality bipartite matching — augmenting-path phases
    over the greedy maximal initializer.

    Reference: Applications/BipartiteMatchings/BPMaximumMatching.cpp
    (maximumMatching: maximal init + repeated SpMV-style augmenting-path
    sweeps) and auction.cpp. Spark form, per phase:

      forest  : level-synchronous alternating BFS from every unmatched
                row vertex at once (the reference's multi-source SpMV
                frontier). Odd steps traverse ANY edge row->col; even
                steps traverse the unique MATCHED edge col->row. Each
                column is visited once per phase and records
                (parent row, tree root) — parent = min adjacent frontier
                row, so the forest is deterministic.
      select  : per tree root, ONE reached free column (min by
                (level, id)). Trees partition the visited vertices, so
                the selected augmenting paths are vertex-disjoint by
                construction — all flip in parallel.
      augment : walk each selected path back root-ward via the recorded
                parents (bounded by the BFS depth), adding the odd edges
                to the matching and removing the even ones: cardinality
                +1 per tree.

    A phase that reaches no free column proves the matching maximum
    (standard BFS certificate: no augmenting path exists), so extra
    phases are no-ops — which is what lets the driver oracle unroll a
    fixed phase count exactly. Every step is an edge- or
    frontier-sized join with map-side combine; nothing is quadratic.
    100-TB shape: phases <= row-side deficiency of the greedy init
    (small on real graphs), each phase O(diameter) supersteps.

    Returns matched (src, dst) pairs.
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst").distinct().persist(StorageLevel.MEMORY_AND_DISK)
    e.count()

    matching = bipartite_maximal_matching(e).localCheckpoint(eager=True)

    phase = 0
    while max_phases is None or phase < max_phases:
        m_src = matching.select("src")
        m_dst = matching.select("dst")
        # roots: unmatched rows that have at least one edge
        roots = (
            e.select("src").distinct().join(m_src, "src", "left_anti")
            .select(F.col("src").alias("id"), F.col("src").alias("root"))
            .localCheckpoint(eager=True)
        )
        if roots.isEmpty():
            break

        # matched column -> its (unique) matched row, for even steps
        m_of_dst = matching.select("dst", F.col("src").alias("msrc"))
        m_of_src = matching.select("src", F.col("dst").alias("mdst"))

        frontier = roots  # (id=row, root)
        visited_d = spark.createDataFrame([], "dst long")
        parent_d = spark.createDataFrame([], "dst long, psrc long, root long, lvl int")
        endpoints = spark.createDataFrame([], "dst long, psrc long, root long, lvl int")
        for t in range(1, max_depth + 1, 2):
            # odd step: rows -> any adjacent unvisited column;
            # parent = min adjacent frontier row (deterministic forest)
            new_d = (
                e.join(frontier.withColumnRenamed("id", "src"), "src")
                .join(visited_d, "dst", "left_anti")
                .groupBy("dst")
                .agg(F.min("src").alias("psrc"), F.min_by("root", "src").alias("root"))
                .withColumn("lvl", F.lit(t))
                .localCheckpoint(eager=True)
            )
            if new_d.isEmpty():
                break
            visited_d = visited_d.unionByName(new_d.select("dst")).localCheckpoint(eager=True)
            parent_d = parent_d.unionByName(new_d).localCheckpoint(eager=True)
            free_d = new_d.join(m_dst, "dst", "left_anti")
            endpoints = endpoints.unionByName(free_d).localCheckpoint(eager=True)
            # even step: matched columns -> their matched row (forced edge)
            frontier = (
                new_d.join(m_of_dst, "dst")
                .select(F.col("msrc").alias("id"), "root")
                .localCheckpoint(eager=True)
            )
            if frontier.isEmpty():
                break

        if endpoints.isEmpty():
            break  # no augmenting path anywhere -> maximum

        # one endpoint per tree: min (lvl, dst)
        chosen = (
            endpoints.groupBy("root")
            .agg(F.min_by(F.struct("lvl", "dst", "psrc"), F.struct("lvl", "dst")).alias("c"))
            .select("root", F.col("c.dst").alias("dst"), F.col("c.lvl").alias("lvl"))
            .localCheckpoint(eager=True)
        )
        n_aug = chosen.count()
        if metrics is not None:
            metrics.append({"phase": phase, "augmented": n_aug})

        # walk back root-ward, flipping as we go
        cur = chosen
        adds = spark.createDataFrame([], "src long, dst long")
        removes = spark.createDataFrame([], "src long, dst long")
        while not cur.isEmpty():
            step = cur.join(parent_d.select("dst", "psrc", F.col("lvl").alias("_plvl")), "dst")
            adds = adds.unionByName(
                step.select(F.col("psrc").alias("src"), "dst")).localCheckpoint(eager=True)
            deeper = step.filter(F.col("_plvl") > 1)
            back = deeper.join(m_of_src.withColumnRenamed("src", "psrc"), "psrc")
            removes = removes.unionByName(
                back.select(F.col("psrc").alias("src"), F.col("mdst").alias("dst"))
            ).localCheckpoint(eager=True)
            cur = back.select(
                "root", F.col("mdst").alias("dst"), (F.col("_plvl") - 2).alias("lvl")
            ).localCheckpoint(eager=True)

        matching = (
            matching.join(removes, ["src", "dst"], "left_anti")
            .unionByName(adds)
            .localCheckpoint(eager=True)
        )
        phase += 1

    e.unpersist()
    return matching
