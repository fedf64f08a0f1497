"""Co-citation and bibliographic-coupling similarity (Small 1973 /
Kessler 1963): the two classic link-graph document-similarity measures,
and the HITS-adjacent "related pages" primitive on a web graph.

Reference parity: both are SpGEMM compositions on the adjacency matrix
(cocitation = A^T A, coupling = A A^T — the same products the reference
builds with PSpGEMM, e.g. Mult_AnXBn_Synch in SpParMat.h used for
AAT-style squarings), restricted to the off-diagonal upper triangle.
Rather than materializing the full product through the generic spgemm
operator, the implementation fuses the triangular restriction and the
weight threshold into the join itself — at web scale the full A^T A is
quadratically dense around hub citers, so the filters must run BEFORE
the aggregate, not on its output.

Scale design (100 TB web graph):
- The self-join is keyed on the shared endpoint (src for co-citation,
  dst for coupling) — one hash exchange of the deduped edge list, then
  a co-partitioned join; no all-pairs stage.
- A citer with out-degree d contributes d*(d-1)/2 pairs; a navigation
  or spam hub with d=10^5 alone yields 5e9 pairs. ``max_degree`` caps
  the contributing degree (the standard co-citation practice: drop
  hub citers, whose co-citations carry no topical signal — they cite
  everything). The cap is applied with an aggregate + semi-join before
  the self-join, so the quadratic blowup never materializes.
- ``min_weight`` prunes after a partial+final hash aggregate: map-side
  combine absorbs same-partition pair duplicates before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pair_counts(edges: DataFrame, key: str, item: str,
                 min_weight: int, max_degree: int | None) -> DataFrame:
    """Count pairs of ``item`` values sharing a ``key`` value."""
    if min_weight < 1:
        raise ValueError(f"min_weight must be >= 1, got {min_weight}")
    e = edges.select(key, item).where(F.col("src") != F.col("dst")).distinct()
    if max_degree is not None:
        if max_degree < 2:
            raise ValueError(f"max_degree must be >= 2, got {max_degree}")
        ok = (
            e.groupBy(key).agg(F.count(F.lit(1)).alias("_d"))
            .where(F.col("_d") <= max_degree)
            .select(key)
        )
        e = e.join(ok, key, "left_semi")
    a = e.select(F.col(key).alias("_k"), F.col(item).alias("id_a"))
    b = e.select(F.col(key).alias("_k"), F.col(item).alias("id_b"))
    return (
        a.join(b, "_k")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("weight"))
        .where(F.col("weight") >= min_weight)
    )


def cocitation(edges: DataFrame, min_weight: int = 2,
               max_degree: int | None = None) -> DataFrame:
    """Co-citation pairs: (id_a, id_b, weight) with id_a < id_b where
    ``weight`` = number of distinct pages linking to BOTH a and b
    (off-diagonal of A^T A on the boolean pattern). Loops are ignored;
    parallel edges count once. ``max_degree`` drops citers with more
    than that many distinct out-links before pairing (hub suppression,
    see module docstring)."""
    return _pair_counts(edges, "src", "dst", min_weight, max_degree)


def bibliographic_coupling(edges: DataFrame, min_weight: int = 2,
                           max_degree: int | None = None) -> DataFrame:
    """Bibliographic-coupling pairs: (id_a, id_b, weight) with
    id_a < id_b where ``weight`` = number of distinct pages that BOTH
    a and b link to (off-diagonal of A A^T on the boolean pattern).
    ``max_degree`` here caps a target's distinct in-degree — a page
    cited by everyone couples everyone."""
    return _pair_counts(edges, "dst", "src", min_weight, max_degree)
