"""Butterfly (bipartite 4-cycle / co-citation square) counting.

The bipartite sibling of triangle counting (reference:
Applications/TriCnt*, the masked-SpGEMM wedge trick in
ReleaseTests/MaskedSpGEMM): a directed link graph viewed bipartitely
(citing side x cited side) has a butterfly for every pair of sources
that co-cite the same pair of destinations — s1->d1, s1->d2, s2->d1,
s2->d2. Dense butterfly blooms are the classic link-farm / boilerplate-
template signature in webgraphs (Wang et al., "Butterfly Counting in
Bipartite Networks", KDD 2019 uses the same wedge aggregation).

Counting identity: if sources s1 < s2 share c common out-neighbors,
that pair closes C(c, 2) butterflies, each counted once. Per-source
butterfly counts attribute C(c, 2) to both endpoints of the pair.

Scale shape: ONE self-equi-join on dst produces the co-citation wedge
table — a destination with in-degree d contributes C(d, 2) wedges, so
the cost is sum-of-squares of in-degrees, the same bound every exact
butterfly counter pays; the groupBy then collapses wedges to source
pairs with map-side partial aggregation. Hub destinations (the skew
axis) are an equi-join key, so AQE skew-split applies; at crawl scale
you pre-cap pathological in-degree (a dst cited by 10^6 pages is a
boilerplate link, not signal) with ``max_in_degree``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def butterflies(edges: DataFrame, max_in_degree: int | None = None) -> DataFrame:
    """Per-vertex butterfly counts over the distinct directed edge set
    (loops dropped). Returns (id, butterflies) for every vertex of the
    graph, zero-filled.

    ``max_in_degree``: drop destinations cited by more than this many
    sources before wedging (the documented hub cap for crawl scale —
    None keeps everything, exact).
    """
    de = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    if max_in_degree is not None:
        keep = (
            de.groupBy("dst").agg(F.count(F.lit(1)).alias("_ind"))
            .where(F.col("_ind") <= max_in_degree)
            .select("dst")
        )
        de = de.join(keep, "dst")
    a = de.select(F.col("src").alias("s1"), "dst")
    b = de.select(F.col("src").alias("s2"), "dst")
    pairs = (
        a.join(b, "dst")
        .where(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .withColumn("bf", F.expr("(c * (c - 1)) div 2"))
    )
    contrib = pairs.select(F.col("s1").alias("id"), "bf").unionByName(
        pairs.select(F.col("s2").alias("id"), "bf"))
    pv = contrib.groupBy("id").agg(F.sum("bf").alias("butterflies"))
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return verts.join(pv, "id", "left").select(
        "id", F.coalesce("butterflies", F.lit(0)).alias("butterflies"))
