"""Connected components — FastSV-style min-label hooking + pointer jumping.

Follows the shape of the reference's FastSV driver
(Applications/FastSV.h:336-374): per superstep
    gp    = f[f[v]]                       (grandparent gather, Extract)
    mngp  = SpMV<Select2ndMin>(A, gp)      (min grandparent of neighbors)
    hook  = scatter-min mngp[v] onto f[v]  (Assign with MPI_MIN combine)
    f'    = min(f, gp, mngp, hooks)        (EWise mins)
converging when no label changes. Labels converge to the minimum vertex
id of each component — exactly comparable to scipy and to a DuckDB
transitive-closure oracle.

Every step is a join or a groupBy-min; the scatter's duplicate-combining
groupBy (vector_assign) is the skew fix the reference implements by hand
in ReduceAssign (FastSV.h:68-130).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from combblas_spark.graph import symmetrize, vertices
from combblas_spark.operators.semiring import SELECT2ND_MIN
from combblas_spark.operators.spmv import spmv


def connected_components(
    edges: DataFrame,
    max_iter: int = 50,
    checkpoint_interval: int = 3,
    metrics: list | None = None,
) -> DataFrame:
    """Returns (id, comp) where comp = min vertex id in the component."""
    sym = symmetrize(edges).persist(StorageLevel.MEMORY_AND_DISK)
    sym.count()
    verts = vertices(edges)

    f = verts.select("id", F.col("id").alias("val")).persist()
    f.count()

    for it in range(max_iter):
        # grandparent: gp[v] = f[f[v]]
        gp = (
            f.select("id", F.col("val").alias("_p"))
            .join(f.select(F.col("id").alias("_p"), F.col("val").alias("gpv")), "_p")
            .select("id", F.col("gpv").alias("val"))
        )
        # min grandparent among neighbors (sym edges -> both directions)
        mngp = spmv(sym, gp, SELECT2ND_MIN)
        # hooking: push mngp[v] onto the parent f[v]
        hooks = (
            f.select("id", F.col("val").alias("_p"))
            .join(mngp.withColumnRenamed("val", "_m"), "id")
            .select(F.col("_p").alias("id"), F.col("_m").alias("val"))
        )
        updates = gp.unionByName(mngp).unionByName(hooks)
        umin = updates.groupBy("id").agg(F.min("val").alias("_u"))
        new_f = (
            f.join(umin, "id", "left")
            .select("id", F.least(F.col("val"), F.coalesce(F.col("_u"), F.col("val"))).alias("val"))
        )
        if (it + 1) % checkpoint_interval == 0:
            new_f = new_f.localCheckpoint(eager=False)
        new_f = new_f.persist()

        changed = (
            new_f.join(f.withColumnRenamed("val", "_old"), "id")
            .filter(F.col("val") != F.col("_old"))
            .count()
        )
        f.unpersist()
        f = new_f
        if metrics is not None:
            metrics.append({"iter": it, "changed": changed})
        if changed == 0:
            break

    sym.unpersist()
    return f.select("id", F.col("val").alias("comp"))
