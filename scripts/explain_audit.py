"""Regenerate the PLANS.md evidence: print `.explain("formatted")` for
the audited plans (scan pushdown, zero-exchange SpMV, masked wedge
count). Usage: python scripts/explain_audit.py"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from combblas_spark import get_spark
from combblas_spark.algorithms.triangles import lower_triangle
from combblas_spark.graph import events_graph, vertices


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="explain-audit", cores=8, shuffle_partitions=16,
                      driver_memory="8g")

    print("=== 1. parquet scan: pushdown + column pruning ===")
    ev = spark.read.parquet(f"{sf}/events.parquet")
    ev.filter(F.col("user_id") < 10).select("user_id", "event_id").explain("formatted")

    print("=== 2. zero-exchange SpMV (dst-partitioned cached edges + broadcast vector) ===")
    g = events_graph(spark, sf).repartition(16, "dst").persist()
    g.count()
    rv = vertices(g).select(F.col("id").alias("_rid"), F.lit(1.0).alias("_r"))
    (
        g.join(F.broadcast(rv), g["src"] == F.col("_rid"))
        .select(F.col("dst").alias("id"), (F.col("val") * F.col("_r")).alias("_c"))
        .groupBy("id").agg(F.sum("_c").alias("v"))
    ).explain("formatted")

    print("=== 3. triangle count: mask as semi-join before aggregation ===")
    L = lower_triangle(g)
    ab = L.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = L.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    (
        ab.join(bc, "b").select("a", "c")
        .join(L.select(F.col("src").alias("a"), F.col("dst").alias("c")),
              ["a", "c"], "left_semi")
        .agg(F.count(F.lit(1)))
    ).explain("formatted")

    print("=== 4. id-dictionary (ReadGeneralizedTuples path): Python-free ===")
    from combblas_spark.graph import relabel_to_dense_ids

    e = spark.createDataFrame(
        [(f"u{i}", f"u{(i * 7) % 50}") for i in range(200)],
        "src_url string, dst_url string")
    _, d = relabel_to_dense_ids(e)
    d.explain("formatted")
    lineage = d._jdf.queryExecution().toRdd().toDebugString()
    assert "PythonRDD" not in lineage, "PythonRDD in dictionary lineage"
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert all(m not in plan for m in
               ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"))
    print("dictionary plan + lineage: PYTHON-FREE (asserted)")

    print("=== 5. ANF hop / HITS half-step / k-core round: "
          "zero exchange above the cache, Python-free ===")
    from combblas_spark.algorithms.anf import _init_mask
    from combblas_spark.graph import symmetrize_partitioned

    sym = symmetrize_partitioned(g, "dst", 16).select("src", "dst").persist()
    sym.count()
    state = (
        vertices(g).select("id", *[_init_mask(j, 42, 24) for j in range(4)])
        .coalesce(1).localCheckpoint()
    )
    mv = F.broadcast(state.select(F.col("id").alias("src"), "m0", "m1", "m2", "m3"))
    anf_hop = (
        sym.join(mv, "src").groupBy(F.col("dst").alias("id"))
        .agg(*[F.bit_or(f"m{j}").alias(f"_n{j}") for j in range(4)])
    )
    e_dst = g.select("src", "dst").repartition(16, "dst").persist()
    e_dst.count()
    vec = F.broadcast(vertices(g).select("id", F.lit(1.0).alias("v")))
    hits_half = (
        e_dst.join(vec, e_dst["src"] == vec["id"])
        .groupBy(e_dst["dst"].alias("id")).agg(F.sum("v").alias("v"))
    )
    alive = F.broadcast(vertices(g).select("id").coalesce(1).localCheckpoint())
    kcore_round = (
        sym.join(alive.withColumnRenamed("id", "src"), "src", "left_semi")
        .groupBy(F.col("dst").alias("id")).agg(F.count(F.lit(1)).alias("_d"))
        .join(alive, "id", "left_semi")
    )
    for name, df in (("anf_hop", anf_hop), ("hits_half_step", hits_half),
                     ("kcore_round", kcore_round)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        above = plan.split("InMemoryRelation", 1)[0]
        assert "Exchange" not in above, f"{name}: exchange above the cache"
        assert all(m not in plan for m in
                   ("BatchEvalPython", "ArrowEvalPython", "MapInPandas")), name
        print(f"{name}: zero-exchange above cache, PYTHON-FREE (asserted)")
    spark.stop()


if __name__ == "__main__":
    main()
