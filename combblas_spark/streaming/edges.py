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


# ----------------------------------------------------------- edge table
# Layout (the Spark-native stand-in for an Iceberg table):
#   <table>/delta/batch=<id>/   per-micro-batch summed deltas (parquet)
#   <table>/base/bucket=<k>/    compacted base, hash(src)-bucketed
#   <table>/_compacted.json     batch ids already absorbed into base
#                               (written by atomic rename)
# A replayed micro-batch (foreachBatch is AT-LEAST-once, not exactly-
# once) rewrites the SAME delta/batch=<id> directory with identical
# content — idempotent by construction, no read-modify-write anywhere
# in the hot path. Per-batch cost is O(batch), never O(table).

N_BUCKETS = 32


def _compacted_ids(table_path: str) -> set[int]:
    import json
    import os

    p = os.path.join(table_path, "_compacted.json")
    if not os.path.exists(p):
        return set()
    with open(p) as fh:
        return set(json.load(fh)["batches"])


def read_edge_table(spark: SparkSession, table_path: str) -> DataFrame:
    """Current (src, dst, val) view: compacted base + unabsorbed deltas,
    duplicate-summed (the SpParMat-ctor semantics, SpParMat.h:85-86)."""
    import os

    parts = []
    base = os.path.join(table_path, "base")
    if os.path.exists(base):
        parts.append(spark.read.parquet(base).select("src", "dst", "val"))
    delta_root = os.path.join(table_path, "delta")
    if os.path.exists(delta_root) and any(
            d.startswith("batch=") for d in os.listdir(delta_root)):
        absorbed = _compacted_ids(table_path)
        d = spark.read.option("basePath", delta_root).parquet(delta_root)
        if absorbed:
            d = d.filter(~F.col("batch").isin([int(b) for b in absorbed]))
        parts.append(d.select("src", "dst", "val"))
    if not parts:
        raise FileNotFoundError(f"no edge table at {table_path}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("src", "dst").agg(F.sum("val").alias("val"))


def compact_edge_table(spark: SparkSession, table_path: str) -> int:
    """Fold outstanding deltas into the bucket-partitioned base,
    REWRITING ONLY TOUCHED BUCKETS (dynamic partition overwrite) — the
    maintenance analogue of Iceberg MERGE compaction. Returns the
    number of batches absorbed.

    Crash ordering: base partitions are written first, the absorbed-ids
    manifest second (atomic rename), delta dirs deleted last. Readers
    consult the manifest, so a crash between the steps re-reads or
    re-compacts deltas against the OLD manifest; the residual window —
    base written but manifest not yet swapped — is the part a real
    table format's single-commit atomicity closes.
    """
    import json
    import os
    import shutil

    delta_root = os.path.join(table_path, "delta")
    if not os.path.exists(delta_root):
        return 0
    absorbed = _compacted_ids(table_path)
    all_ids = {int(d.split("=", 1)[1]) for d in os.listdir(delta_root)
               if d.startswith("batch=")}
    todo = sorted(all_ids - absorbed)
    if not todo:
        return 0
    # NOTE: absorbed ids stay in the manifest FOREVER — a crash between
    # compaction and the stream checkpoint commit replays the batch,
    # recreating its delta dir; the manifest is what marks it already
    # applied (else it would double-count).

    d = (
        spark.read.option("basePath", delta_root).parquet(delta_root)
        .filter(F.col("batch").isin([int(b) for b in todo]))
        .select("src", "dst", "val", "bucket")
    )
    base = os.path.join(table_path, "base")
    touched = [r["bucket"] for r in d.select("bucket").distinct().collect()]
    merged = d
    if os.path.exists(base):
        existing = (
            spark.read.parquet(base)
            .filter(F.col("bucket").isin(touched))  # partition-pruned scan
            .select("src", "dst", "val", "bucket")
        )
        merged = merged.unionByName(existing)
    (
        merged.groupBy("src", "dst", "bucket").agg(F.sum("val").alias("val"))
        .repartition(F.col("bucket"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")  # only touched buckets
        .partitionBy("bucket")
        .parquet(base)
    )
    tmp = os.path.join(table_path, "._compacted.tmp")
    with open(tmp, "w") as fh:
        json.dump({"batches": sorted(absorbed | set(todo))}, fh)
    os.replace(tmp, os.path.join(table_path, "_compacted.json"))
    # delete every now-absorbed dir, including ones a replay recreated
    # after an earlier compaction already applied them
    for b in sorted(all_ids):
        shutil.rmtree(os.path.join(delta_root, f"batch={b}"), ignore_errors=True)
    return len(todo)


def run_edge_merge(
    spark: SparkSession,
    input_dir: str,
    table_path: str,
    checkpoint_dir: str,
    n_vertices: int,
    available_now: bool = True,
    compact_every: int | None = 8,
):
    """Continuously merge arriving events into the edge table at
    ``table_path`` (delta-log layout above; Iceberg MERGE INTO where a
    catalog exists).

    foreachBatch delivers each micro-batch AT LEAST once; the sink is
    idempotent because a batch writes only its own delta/batch=<id>
    directory (same id -> same path -> same bytes on replay). Every
    ``compact_every`` batches the delta log is folded into the
    bucket-partitioned base, rewriting only touched bucket partitions.
    available_now=True drains what's there and stops (test/backfill
    mode).
    """
    import os

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
        sums = (
            batch_df.groupBy("src", "dst")
            .agg(F.count(F.lit(1)).cast("double").alias("val"))
            .withColumn("bucket", F.pmod(F.hash("src"), F.lit(N_BUCKETS)))
        )
        sums.write.mode("overwrite").parquet(
            os.path.join(table_path, "delta", f"batch={batch_id}"))
        if compact_every and (batch_id + 1) % compact_every == 0:
            compact_edge_table(spark, table_path)

    writer = (
        deltas.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
