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

from pyspark.sql import DataFrame
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
