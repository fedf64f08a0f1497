"""Structured Streaming: incremental edge-table maintenance.

Drops two event-batch parquet files into a stream source dir, drains
with availableNow, and checks the merged edge table equals the batch
build over the union — the streaming twin of the SpParMat-ctor
duplicate-summing semantics (SpParMat.h:85-86).
"""

import datetime as dt

from pyspark.sql import functions as F

from combblas_spark.graph import HASH_C, build_graph
from combblas_spark.streaming import run_edge_merge


def _events(spark, rows):
    return spark.createDataFrame(
        [(eid, dt.datetime(2025, 1, 1, 0, 0, s), uid, "click", 1.0, "{}")
         for eid, s, uid in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_stream_merge_equals_batch_build(spark, tmp_path):
    nv = 16
    src_dir = str(tmp_path / "in")
    table = str(tmp_path / "edges")
    ck = str(tmp_path / "ck")

    batch1 = [(i, i % 60, i % nv) for i in range(40)]
    batch2 = [(100 + i, i % 60, (i * 3) % nv) for i in range(40)]
    _events(spark, batch1).write.mode("append").parquet(src_dir)

    q = run_edge_merge(spark, src_dir, table, ck, n_vertices=nv)
    q.awaitTermination(120)

    _events(spark, batch2).write.mode("append").parquet(src_dir)
    q2 = run_edge_merge(spark, src_dir, table, ck, n_vertices=nv)
    q2.awaitTermination(120)

    got = {(r["src"], r["dst"]): r["val"]
           for r in spark.read.parquet(table).collect()}

    all_events = _events(spark, batch1 + batch2)
    expected_raw = all_events.select(
        F.col("user_id").alias("src"),
        ((F.col("event_id") * F.lit(HASH_C)) % F.lit(nv)).alias("dst"),
    )
    expected = {(r["src"], r["dst"]): r["val"]
                for r in build_graph(expected_raw).collect()}
    assert got == expected


def test_stream_dedup_replayed_events(spark, tmp_path):
    """The same event file content replayed (new file, same event_ids)
    must not double-count within the watermark."""
    nv = 16
    src_dir = str(tmp_path / "in")
    table = str(tmp_path / "edges")
    ck = str(tmp_path / "ck")

    rows = [(i, i % 60, i % nv) for i in range(30)]
    _events(spark, rows).write.mode("append").parquet(src_dir)
    _events(spark, rows).write.mode("append").parquet(src_dir)  # replay

    q = run_edge_merge(spark, src_dir, table, ck, n_vertices=nv)
    q.awaitTermination(120)

    got = {(r["src"], r["dst"]): r["val"]
           for r in spark.read.parquet(table).collect()}
    expected = {(r["src"], r["dst"]): r["val"]
                for r in build_graph(
                    _events(spark, rows).select(
                        F.col("user_id").alias("src"),
                        ((F.col("event_id") * F.lit(HASH_C)) % F.lit(nv)).alias("dst"),
                    )).collect()}
    assert got == expected
