"""Triangle counting — the masked-SpGEMM lower-triangle trick.

Standard CombBLAS usage (not in the reference repo itself; north rule
requires it): with L the strictly-lower-triangular pattern of the
undirected adjacency, triangles = sum(L .* (L x L)). Here the mask is
pushed into the plan as a semi-join BEFORE aggregation (see
operators.spgemm.masked_spgemm), so wedges that close no triangle are
filtered at the join, not materialized.

Ordering vertices by id (src < dst canonical form) bounds the join fan-
out by the smaller endpoint's degree — the classic heavy-hitter
mitigation for power-law graphs (each wedge is generated at its lowest
vertex).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from combblas_spark.graph import symmetrize


def lower_triangle(edges: DataFrame) -> DataFrame:
    """Canonical undirected pattern: distinct pairs with src < dst."""
    sym = symmetrize(edges)
    return sym.filter(F.col("src") < F.col("dst")).select("src", "dst")


def triangle_count(edges: DataFrame) -> int:
    """Total number of triangles in the undirected view of ``edges``."""
    L = lower_triangle(edges)
    # wedges a<b<c from L(a,b) and L(b,c); close with L(a,c)
    ab = L.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = L.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    wedges = ab.join(bc, "b").select("a", "c")
    closed = wedges.join(
        L.select(F.col("src").alias("a"), F.col("dst").alias("c")), ["a", "c"], "left_semi"
    )
    return closed.count()


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """(id, tri) — number of triangles incident to each vertex."""
    L = lower_triangle(edges)
    ab = L.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = L.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tri = (
        ab.join(bc, "b")
        .join(L.select(F.col("src").alias("a"), F.col("dst").alias("c")), ["a", "c"], "left_semi")
        .select("a", "b", "c")
    )
    per_v = (
        tri.select(F.col("a").alias("id"))
        .unionByName(tri.select(F.col("b").alias("id")))
        .unionByName(tri.select(F.col("c").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("tri"))
    )
    return per_v
