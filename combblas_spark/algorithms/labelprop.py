"""Synchronous label propagation with deterministic min-label tie-break.

Not in the reference (north rule requires it); expressed as the "most
frequent neighbor label" semiring from SURVEY.md §2.6: a mode/argmax
aggregate is not a single Spark agg, so it is the documented two-stage
groupBy (count per (vertex,label)) + per-vertex argmax window with a
deterministic min-label tie-break — which keeps results EXACT and
SQL-oracle-comparable.

Rounds are synchronous and fixed-count (n_rounds) so the DuckDB oracle
can unroll the identical recurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from combblas_spark.graph import symmetrize, vertices


def label_propagation(
    edges: DataFrame,
    n_rounds: int = 5,
    checkpoint_interval: int = 3,
) -> DataFrame:
    """Returns (id, label). Initial label = vertex id; each round every
    vertex adopts the most frequent label among its (undirected)
    neighbors, ties broken by smallest label; vertices with no
    neighbors keep their label (none here: vertex set = src+dst)."""
    sym = symmetrize(edges).select("src", "dst").persist()
    sym.count()
    verts = vertices(edges)

    labels = verts.select("id", F.col("id").alias("label")).persist()
    labels.count()

    for r in range(n_rounds):
        nbr = (
            sym.join(labels.select(F.col("id").alias("src"), "label"), "src")
            .groupBy(F.col("dst").alias("id"), "label")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        w = Window.partitionBy("id").orderBy(F.col("_c").desc(), F.col("label").asc())
        best = (
            nbr.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("id", F.col("label").alias("_new"))
        )
        new_labels = (
            labels.join(best, "id", "left")
            .select("id", F.coalesce(F.col("_new"), F.col("label")).alias("label"))
        )
        if (r + 1) % checkpoint_interval == 0:
            new_labels = new_labels.localCheckpoint(eager=False)
        new_labels = new_labels.persist()
        new_labels.count()
        labels.unpersist()
        labels = new_labels

    sym.unpersist()
    return labels
