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


def lower_triangle(edges: DataFrame, order_by_degree: bool = False) -> DataFrame:
    """Canonical undirected pattern: distinct pairs oriented low -> high.

    order_by_degree=False orients by vertex id (src < dst) — the cheap
    default, and the oracle-stable one. order_by_degree=True orients by
    (degree, id) rank: every wedge is generated at its LOWEST-DEGREE
    vertex, which bounds the join fan-out by the smaller endpoint degree
    — the standard heavy-hitter mitigation on power-law graphs (at web
    scale a hub with degree 10^7 would otherwise emit 10^14 wedges).
    Triangle counts are orientation-invariant (property-tested).
    """
    sym = symmetrize(edges)
    if not order_by_degree:
        return sym.filter(F.col("src") < F.col("dst")).select("src", "dst")
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("_d"))
    s = deg.select(F.col("id").alias("src"), F.col("_d").alias("_ds"))
    d = deg.select(F.col("id").alias("dst"), F.col("_d").alias("_dd"))
    ranked = sym.join(s, "src").join(d, "dst")
    lower = (F.col("_ds") < F.col("_dd")) | (
        (F.col("_ds") == F.col("_dd")) & (F.col("src") < F.col("dst")))
    return ranked.filter(lower).select("src", "dst")


def triangle_count(edges: DataFrame, order_by_degree: bool = False) -> int:
    """Total number of triangles in the undirected view of ``edges``."""
    # L feeds the plan THREE times (both wedge sides + the closing mask)
    # and Catalyst does NOT reuse the symmetrize-dedup subtree across
    # them (measured: 9 exchanges, 0 ReusedExchange on the events graph)
    # — persist it so the dedup runs once.
    L = lower_triangle(edges, order_by_degree).persist()
    # wedges a<b<c from L(a,b) and L(b,c); close with L(a,c)
    ab = L.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = L.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    wedges = ab.join(bc, "b").select("a", "c")
    closed = wedges.join(
        L.select(F.col("src").alias("a"), F.col("dst").alias("c")), ["a", "c"], "left_semi"
    )
    n = closed.count()
    L.unpersist()
    return n


def triangles_per_vertex(edges: DataFrame, order_by_degree: bool = False,
                         lt: DataFrame | None = None) -> DataFrame:
    """(id, tri) — number of triangles incident to each vertex.

    L persisted for the same triple-reference reason as triangle_count;
    the result is materialized (eager localCheckpoint) so the cache can
    be released before returning. ``lt`` lets a caller that already
    holds the persisted lower triangle (e.g. vertex_features) pass it
    in, skipping the second symmetrize+distinct shuffle; ownership stays
    with the caller (not unpersisted here)."""
    caller_owns = lt is not None
    L = lt if caller_owns else lower_triangle(edges, order_by_degree).persist()
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
    per_v = per_v.localCheckpoint(eager=True)
    if not caller_owns:
        L.unpersist()
    return per_v


def four_cliques_per_vertex(edges: DataFrame,
                            order_by_degree: bool = False) -> DataFrame:
    """(id, k4) — number of 4-cliques (K4) incident to each vertex of
    the undirected simple graph, zero-filled over all vertices.

    The next rung of the masked-SpGEMM graphlet ladder after triangles
    (reference: the TriCnt/MaskedSpGEMM trick, ReleaseTests/
    MaskedSpGEMM; k-clique extension per Danisch et al., "Listing
    k-cliques in Sparse Real-World Graphs", WWW 2018): orient edges
    (id order by default, degree order for power-law scale — the same
    ``order_by_degree`` lever as triangle_count, counts are
    orientation-invariant), enumerate oriented triangles a<b<c, then
    close each with a fourth vertex d adjacent to all three via one
    equi-join on the (c, d) edge plus two semi-join masks — every K4 is
    produced exactly once at its sorted orientation.

    Scale shape: the K4 join fans out from the triangle table by the
    orientation-bounded out-degree of c (degree ordering bounds it by
    the smallest remaining endpoint, the Danisch bound); the masks are
    semi-joins, never wedge materializations; attribution is four
    narrow unions + one hash agg.
    """
    L = lower_triangle(edges, order_by_degree).persist()
    ab = L.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = L.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tri = (
        ab.join(bc, "b")
        .join(L.select(F.col("src").alias("a"), F.col("dst").alias("c")),
              ["a", "c"], "left_semi")
    )
    k4 = (
        tri.join(L.select(F.col("src").alias("c"), F.col("dst").alias("d")), "c")
        .join(L.select(F.col("src").alias("a"), F.col("dst").alias("d")),
              ["a", "d"], "left_semi")
        .join(L.select(F.col("src").alias("b"), F.col("dst").alias("d")),
              ["b", "d"], "left_semi")
    )
    contrib = (
        k4.select(F.col("a").alias("id"))
        .unionByName(k4.select(F.col("b").alias("id")))
        .unionByName(k4.select(F.col("c").alias("id")))
        .unionByName(k4.select(F.col("d").alias("id")))
        .groupBy("id").agg(F.count(F.lit(1)).alias("k4"))
    )
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    out = verts.join(contrib, "id", "left").select(
        "id", F.coalesce("k4", F.lit(0)).alias("k4"))
    out = out.localCheckpoint(eager=True)
    L.unpersist()
    return out


def weighted_triangle_intensity(edges: DataFrame,
                                weight_col: str = "val") -> DataFrame:
    """Per-vertex weighted triangle intensity: for every triangle
    {a,b,c} the product of its three undirected edge weights
    (w{a,b} = summed integer ``weight_col`` over both directions —
    multigraph multiplicity), summed at each corner. The
    integer-exact member of the weighted-clustering family: the
    Onnela geometric-mean coefficient needs cbrt (not bit-portable);
    the raw intensity is pure BIGINT products/sums, identical in any
    engine and order. Returns (id, tri_w) zero-filled over the vertex
    set.

    Scale shape: the masked-SpGEMM wedge join of triangles_per_vertex
    carrying one extra integer product column — the mask semi-join
    becomes an inner join only to fetch the third weight. Skew and
    cost are the triangle enumeration's, unchanged.
    """
    from combblas_spark.graph import vertices

    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"),
                F.col(weight_col).cast("long").alias("w"))
        .groupBy("a", "b").agg(F.sum("w").alias("w"))
        .persist()
    )
    ab = und.select("a", "b", F.col("w").alias("w_ab"))
    bc = und.select(F.col("a").alias("b"), F.col("b").alias("c"),
                    F.col("w").alias("w_bc"))
    ac = und.select(F.col("a").alias("a2"), F.col("b").alias("c2"),
                    F.col("w").alias("w_ac"))
    tri = (
        ab.join(bc, "b")
        .join(ac, (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")))
        .select("a", "b", "c",
                (F.col("w_ab") * F.col("w_bc") * F.col("w_ac")).alias("p"))
    )
    per_v = (
        tri.select(F.col("a").alias("id"), "p")
        .unionByName(tri.select(F.col("b").alias("id"), "p"))
        .unionByName(tri.select(F.col("c").alias("id"), "p"))
        .groupBy("id").agg(F.sum("p").alias("tri_w"))
    )
    out = (
        vertices(edges).join(per_v, "id", "left")
        .select("id", F.coalesce("tri_w", F.lit(0)).cast("long").alias("tri_w"))
        .localCheckpoint(eager=True)
    )
    und.unpersist()
    return out
