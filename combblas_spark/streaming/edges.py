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

from combblas_spark.graph import hashed_dst


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
            hashed_dst("event_id", n_vertices).alias("dst"),
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
#   <table>/delta/batch=<id>/        per-micro-batch summed deltas
#   <table>/base/bucket=<k>/v=<n>/   IMMUTABLE per-bucket data versions,
#                                    hash(src)-bucketed
#   <table>/_manifest.json           THE commit point (atomic rename):
#                                    {"batches": absorbed delta ids,
#                                     "bucket_versions": {k: current n}}
#   <table>/.stage-*/                compaction staging (GC'd)
# A replayed micro-batch (foreachBatch is AT-LEAST-once, not exactly-
# once) rewrites the SAME delta/batch=<id> directory with identical
# content — idempotent by construction, no read-modify-write anywhere
# in the hot path. Per-batch cost is O(batch), never O(table).
#
# Compaction commits like an Iceberg snapshot: new bucket versions are
# written to fresh immutable dirs FIRST, then ONE os.replace of the
# manifest flips readers to {new bucket versions + absorbed ids}
# simultaneously. A crash anywhere before the rename leaves readers and
# the next compactor on the old manifest — old bucket data AND
# still-unabsorbed deltas, so nothing is double-counted (ADVICE r2: the
# round-2 in-place dynamic-overwrite had a window where base was
# rewritten but the absorbed-ids file wasn't, and a re-run re-applied
# folded deltas). Orphan version/stage dirs from crashed attempts are
# invisible (not in the manifest) and swept by the next compaction.

N_BUCKETS = 32


def _load_manifest(table_path: str) -> dict:
    import json
    import os

    p = os.path.join(table_path, "_manifest.json")
    if not os.path.exists(p):
        return {"batches": [], "bucket_versions": {}}
    with open(p) as fh:
        m = json.load(fh)
    m.setdefault("batches", [])
    m.setdefault("bucket_versions", {})
    return m


def _current_bucket_paths(table_path: str, manifest: dict) -> list[str]:
    import os

    return [
        os.path.join(table_path, "base", f"bucket={k}", f"v={n}")
        for k, n in sorted(manifest["bucket_versions"].items(), key=lambda kv: int(kv[0]))
    ]


def read_edge_table(spark: SparkSession, table_path: str) -> DataFrame:
    """Current (src, dst, val) view: manifest-selected base bucket
    versions + unabsorbed deltas, duplicate-summed (the SpParMat-ctor
    semantics, SpParMat.h:85-86)."""
    import os

    manifest = _load_manifest(table_path)
    parts = []
    cur = _current_bucket_paths(table_path, manifest)
    if cur:
        base = os.path.join(table_path, "base")
        parts.append(
            spark.read.option("basePath", base).parquet(*cur)
            .select("src", "dst", "val"))
    delta_root = os.path.join(table_path, "delta")
    if os.path.exists(delta_root) and any(
            d.startswith("batch=") for d in os.listdir(delta_root)):
        absorbed = set(manifest["batches"])
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
    """Fold outstanding deltas into the bucket-versioned base, WRITING
    ONLY TOUCHED BUCKETS (each to a fresh immutable version dir) and
    committing with a single atomic manifest rename — the maintenance
    analogue of an Iceberg MERGE snapshot commit. Returns the number of
    batches absorbed.

    Crash-safe at every point: before the manifest rename, readers and
    re-compactions see the OLD manifest (old bucket versions, deltas
    still unabsorbed — re-compaction just redoes the same fold into new
    orphan dirs); after it, the new versions and absorbed ids appear
    together. Absorbed ids stay in the manifest forever: a stream
    replay that recreates an absorbed delta dir is ignored and swept.
    """
    import json
    import os
    import shutil
    import time

    delta_root = os.path.join(table_path, "delta")
    if not os.path.exists(delta_root):
        return 0
    manifest = _load_manifest(table_path)
    absorbed = set(manifest["batches"])
    versions = dict(manifest["bucket_versions"])
    all_ids = {int(d.split("=", 1)[1]) for d in os.listdir(delta_root)
               if d.startswith("batch=")}
    todo = sorted(all_ids - absorbed)
    base = os.path.join(table_path, "base")
    if todo:
        d = (
            spark.read.option("basePath", delta_root).parquet(delta_root)
            .filter(F.col("batch").isin([int(b) for b in todo]))
            .select("src", "dst", "val", "bucket")
        )
        touched = [int(r["bucket"]) for r in d.select("bucket").distinct().collect()]
        merged = d
        cur_touched = [
            os.path.join(base, f"bucket={k}", f"v={versions[str(k)]}")
            for k in touched if str(k) in versions
        ]
        if cur_touched:
            existing = (
                spark.read.option("basePath", base).parquet(*cur_touched)
                .select("src", "dst", "val", "bucket")
            )
            merged = merged.unionByName(existing)

        # 1. write new immutable bucket versions via a staging dir
        stage = os.path.join(table_path, f".stage-{int(time.time() * 1000)}")
        (
            merged.groupBy("src", "dst", "bucket").agg(F.sum("val").alias("val"))
            .repartition(F.col("bucket"))
            .write.mode("overwrite").partitionBy("bucket").parquet(stage)
        )
        for k in touched:
            bdir = os.path.join(base, f"bucket={k}")
            os.makedirs(bdir, exist_ok=True)
            have = [int(v.split("=", 1)[1]) for v in os.listdir(bdir)
                    if v.startswith("v=")]
            newv = max(have, default=-1) + 1  # skips orphans from crashes
            os.replace(os.path.join(stage, f"bucket={k}"),
                       os.path.join(bdir, f"v={newv}"))
            versions[str(k)] = newv
        shutil.rmtree(stage, ignore_errors=True)

        # 2. THE commit: one atomic rename flips versions + absorbed ids
        tmp = os.path.join(table_path, "._manifest.tmp")
        with open(tmp, "w") as fh:
            json.dump({"batches": sorted(absorbed | set(todo)),
                       "bucket_versions": versions}, fh)
        os.replace(tmp, os.path.join(table_path, "_manifest.json"))
        absorbed |= set(todo)

    # 3. GC (safe any time after commit; a crash here only leaves
    # garbage that the next call sweeps): absorbed delta dirs — incl.
    # ones a replay recreated after an earlier compaction already
    # applied them — non-current bucket versions, dead staging dirs.
    for b in sorted(all_ids & absorbed):
        shutil.rmtree(os.path.join(delta_root, f"batch={b}"), ignore_errors=True)
    if os.path.exists(base):
        for bd in os.listdir(base):
            if not bd.startswith("bucket="):
                continue
            k = bd.split("=", 1)[1]
            cur = versions.get(k)
            for vd in os.listdir(os.path.join(base, bd)):
                if vd.startswith("v=") and int(vd.split("=", 1)[1]) != cur:
                    shutil.rmtree(os.path.join(base, bd, vd), ignore_errors=True)
    for s in os.listdir(table_path):
        if s.startswith(".stage-"):
            shutil.rmtree(os.path.join(table_path, s), ignore_errors=True)
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
            hashed_dst("event_id", n_vertices).alias("dst"),
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
