"""Structured Streaming ingestion — incremental edge-table maintenance.

The reference is batch-only (no streams/watermarks/state — SURVEY.md
§2.7); this module is the Spark-native extension a continuously-crawled
link graph needs: new page/event batches land in a directory (or Kafka
at deployment; the source is one line to swap), edges are extracted and
MERGED into the canonical edge table with duplicate-summing — the
streaming twin of the SpParMat-ctor semantics (sum duplicates,
SpParMat.h:85-86) — after watermarked dedup of replayed inputs.

Algorithms then re-run (or resume via runtime.SuperstepRunner) on the
refreshed table: classic lambda-style incremental maintenance, all
Catalyst-planned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from combblas_spark.graph import HASH_C


EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of event batches (parquet files dropped into
    ``input_dir``). Swap for ``format("kafka")`` in deployment."""
    return spark.readStream.schema(EVENT_SCHEMA).parquet(input_dir)


def stream_to_edge_deltas(events: DataFrame, n_vertices: int,
                          dedup_watermark: str = "10 minutes") -> DataFrame:
    """events -> deduped edge deltas (src, dst, w).

    Watermarked dropDuplicates on event_id bounds the replay-dedup state
    (late duplicates beyond the watermark are dropped by the engine);
    the edge rule is the same deterministic hash as graph.events_graph.
    """
    return (
        events.withWatermark("ts", dedup_watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select(
            F.col("user_id").alias("src"),
            ((F.col("event_id") * F.lit(HASH_C)) % F.lit(int(n_vertices))).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )


def edge_rate_per_window(events: DataFrame, window: str = "1 minute",
                         watermark: str = "5 minutes") -> DataFrame:
    """Watermarked windowed edge-arrival rate (ops dashboard metric)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_edges"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type", "n_edges",
        )
    )


def run_edge_merge(
    spark: SparkSession,
    input_dir: str,
    table_path: str,
    checkpoint_dir: str,
    n_vertices: int,
    available_now: bool = True,
):
    """Continuously merge arriving events into the edge table at
    ``table_path`` (parquet; Iceberg MERGE INTO where a catalog exists).

    foreachBatch gives exactly-once-per-batch semantics against the
    file sink: each micro-batch's deltas are summed into the existing
    table (read-modify-overwrite here; an Iceberg MERGE in deployment —
    the transform is identical). available_now=True drains what's there
    and stops (test/backfill mode).
    """
    events = read_event_stream(spark, input_dir)
    deltas = (
        events.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select(
            F.col("user_id").alias("src"),
            ((F.col("event_id") * F.lit(HASH_C)) % F.lit(int(n_vertices))).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        sums = batch_df.groupBy("src", "dst").agg(
            F.count(F.lit(1)).cast("double").alias("val"))
        try:
            existing = spark.read.parquet(table_path)
            merged = (
                existing.unionByName(sums)
                .groupBy("src", "dst")
                .agg(F.sum("val").alias("val"))
            )
        except Exception:
            merged = sums
        merged.write.mode("overwrite").parquet(table_path + ".tmp")
        # atomic-ish swap via rewrite (Iceberg MERGE INTO replaces this)
        spark.read.parquet(table_path + ".tmp").write.mode("overwrite").parquet(table_path)

    writer = (
        deltas.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
