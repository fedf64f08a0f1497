"""k-truss — triangle-support edge peeling (Cohen 2008).

The edge-level sibling of k-core (algorithms/kcore.py): the k-truss is
the maximal subgraph in which every edge closes at least k-2 triangles
WITHIN the subgraph. Standard community/cohesion mining on webgraphs;
not in the reference (its triangle kernel stops at counting —
Applications/TriCnt*.cpp), so an extension row.

Peel loop, all relational:

  support(u,v) = |N(u) ∩ N(v)|  — one wedge join per round: the
  canonical edge list joins the symmetric adjacency once per endpoint
  on the shared third vertex, then counts per edge (map-side
  combinable; the same masked-SpGEMM shape as triangles.py, with the
  mask being the edge list itself).
  drop edges with support < k-2; repeat until no edge drops.

Rounds follow the peel depth (like k-core), each round's work is the
wedge enumeration bounded by sum-of-degrees over surviving edges —
shrinking monotonically. Oracle: the DuckDB twin unrolls the identical
rounds (extra rounds past the fixed point are no-ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from combblas_spark.runtime.plans import superstep_checkpoint


def k_truss(edges: DataFrame, k: int, max_rounds: int = 64) -> DataFrame:
    """Returns the canonical undirected edge list (u, v) with u < v of
    the k-truss subgraph (k >= 3; k <= 2 returns all edges)."""
    e = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .where(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )
    e = e.localCheckpoint(eager=True)
    if k <= 2:
        return e
    n_e = e.count()
    converged = n_e == 0
    for r in range(max_rounds):
        if n_e == 0:
            converged = True
            break
        sym = e.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
            e.select(F.col("v").alias("a"), F.col("u").alias("b")))
        n1 = sym.select(F.col("a").alias("u"), F.col("b").alias("w"))
        n2 = sym.select(F.col("a").alias("v"), F.col("b").alias("w"))
        survivors = (
            e.join(n1, "u")
            .join(n2, ["v", "w"])
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("_sup"))
            .where(F.col("_sup") >= k - 2)
            .select("u", "v")
        )
        survivors = superstep_checkpoint(survivors, r)
        n_s = survivors.count()
        e = survivors
        if n_s == n_e:
            converged = True
            break
        n_e = n_s
    if not converged and n_e != 0:  # n_e == 0 on the last round IS the fixpoint
        # same maximality contract as k_core: peel depth is unbounded
        # by any fixed cap, and a non-converged return is a SUPERSET of
        # the k-truss, silently wrong
        raise RuntimeError(
            f"k_truss did not converge within max_rounds={max_rounds}; "
            "raise max_rounds (each round is one wedge-join job)")
    return e


def trussness(
    edges: DataFrame,
    max_iters: int = 100,
    metrics: list | None = None,
) -> DataFrame:
    """Full truss decomposition: (u, v, trussness) with u < v over the
    canonical undirected simple edge list, where trussness(e) = the
    largest k such that e survives in the k-truss. Triangle-free edges
    report 2 (every edge is trivially in the 2-truss).

    The edge-level h-index iteration (Sariyüce, Seshadhri & Pinar,
    "Local Algorithms for Hierarchical Dense Subgraph Discovery", VLDB
    2018 — the truss instance of the same operator core_numbers uses
    for vertices, Lü et al. 2016):

        t_0(e)     = support(e)  (triangles containing e)
        t_{k+1}(e) = H({ min(t_k(e1), t_k(e2)) : {e, e1, e2} a triangle })

    converges monotonically DOWN to trussness(e) - 2. The triangle set
    is enumerated ONCE (static incidence — no re-peeling per k, unlike
    the peel-based k_truss above which answers one fixed k).

    Scale shape: one oriented triangle enumeration (the masked-SpGEMM
    wedge join of triangles.py) -> a 3-rows-per-triangle incidence
    table, persisted; each round is two equi-joins of the edge-value
    vector onto the incidence plus ONE per-edge window (cardinality =
    that edge's triangle count, never global) and a map-side-combinable
    max agg. Convergence via the same sum-fixpoint Observation trick as
    core_numbers (values are monotone non-increasing integers); raises
    on cap exhaustion rather than returning a wrong decomposition.
    """
    from pyspark.sql import Window

    e = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .where(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
        .localCheckpoint(eager=True)
    )
    ab = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    bc = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    ac = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])  # rows unique: a < b < c
    inc = (
        tri.select(F.col("a").alias("eu"), F.col("b").alias("ev"),
                   F.col("a").alias("p1u"), F.col("c").alias("p1v"),
                   F.col("b").alias("p2u"), F.col("c").alias("p2v"))
        .unionByName(
            tri.select(F.col("a").alias("eu"), F.col("c").alias("ev"),
                       F.col("a").alias("p1u"), F.col("b").alias("p1v"),
                       F.col("b").alias("p2u"), F.col("c").alias("p2v")))
        .unionByName(
            tri.select(F.col("b").alias("eu"), F.col("c").alias("ev"),
                       F.col("a").alias("p1u"), F.col("b").alias("p1v"),
                       F.col("a").alias("p2u"), F.col("c").alias("p2v")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    inc.count()

    sup = inc.groupBy("eu", "ev").agg(F.count(F.lit(1)).alias("t"))
    t = (
        e.join(sup, (e["u"] == sup["eu"]) & (e["v"] == sup["ev"]), "left")
        .select("u", "v", F.coalesce("t", F.lit(0)).cast("long").alias("t"))
        .localCheckpoint(eager=True)
    )
    prev_s = int(t.agg(F.sum("t")).collect()[0][0] or 0)
    converged = prev_s == 0  # triangle-free graph: t==0 is the fixpoint
    w = Window.partitionBy("eu", "ev").orderBy(F.col("_rho").desc())
    for it in range(max_iters):
        if converged:
            break
        t1 = t.select(F.col("u").alias("p1u"), F.col("v").alias("p1v"),
                      F.col("t").alias("_t1"))
        t2 = t.select(F.col("u").alias("p2u"), F.col("v").alias("p2v"),
                      F.col("t").alias("_t2"))
        h = (
            inc.join(t1, ["p1u", "p1v"]).join(t2, ["p2u", "p2v"])
            .select("eu", "ev", F.least("_t1", "_t2").alias("_rho"))
            .select("eu", "ev", "_rho", F.row_number().over(w).alias("_r"))
            .filter(F.col("_rho") >= F.col("_r"))
            .groupBy("eu", "ev").agg(F.max("_r").alias("_h"))
        )
        new_t = (
            e.join(h, (e["u"] == h["eu"]) & (e["v"] == h["ev"]), "left")
            .select("u", "v", F.coalesce("_h", F.lit(0)).cast("long").alias("t"))
        )
        obs = Observation()
        new_t = new_t.observe(obs, F.sum("t").alias("s"))
        new_t = superstep_checkpoint(new_t, it)
        s = int(obs.get["s"] or 0)
        t = new_t
        if metrics is not None:
            metrics.append({"iter": it, "sum_t": s})
        if s == prev_s:
            converged = True
        prev_s = s

    inc.unpersist()
    if not converged:
        raise RuntimeError(
            f"trussness did not converge within max_iters={max_iters}; "
            "raise max_iters (the h-index iteration is monotone, so "
            "more rounds always make progress)")
    return t.select("u", "v", (F.col("t") + 2).alias("trussness"))
