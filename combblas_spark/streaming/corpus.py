"""Streaming corpus ingestion: the training-data pipeline as a stream.

Arriving document batches are quality-filtered (Gopher + repetition
rules), exact-deduped within the batch, near-dup-checked INCREMENTALLY
against the standing corpus via the prefix-filter join (batch x corpus
only — never corpus x corpus, so per-batch cost is O(batch x
selectivity) regardless of corpus size), near-dup-canonicalized within
the batch (connected components over the pair graph), and survivors
appended to the corpus as their own ``batch=<id>`` directory.

Idempotent under foreachBatch's at-least-once replay: a batch writes
only its own directory (same id -> same path -> same bytes), and the
standing-corpus read EXCLUDES directories with id >= the current batch
id — a replayed batch never sees its own previous output (which would
self-dedup everything to an empty rewrite).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from combblas_spark.functions.dedup import (
    dedup_exact, near_dup_clusters, prefix_filter_pairs,
)
from combblas_spark.functions.text import gopher_quality_flags, repetition_flags

DOC_SCHEMA = "doc_id long, text string"
_BATCH_RE = re.compile(r"^batch=(\d+)$")


def read_document_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return spark.readStream.schema(DOC_SCHEMA).parquet(input_dir)


def read_corpus(spark: SparkSession, corpus_path: str,
                before_batch: int | None = None) -> DataFrame | None:
    """Standing corpus = union of committed batch directories (ids <
    ``before_batch`` when given). Returns None when empty."""
    if not os.path.isdir(corpus_path):
        return None
    dirs = []
    for name in sorted(os.listdir(corpus_path)):
        m = _BATCH_RE.match(name)
        if m and (before_batch is None or int(m.group(1)) < before_batch):
            dirs.append(os.path.join(corpus_path, name))
    if not dirs:
        return None
    return spark.read.schema(DOC_SCHEMA).parquet(*dirs)


def ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    corpus_path: str,
    threshold: float = 0.8,
    quality_kwargs: dict | None = None,
) -> None:
    """One micro-batch through the full cleaning chain; module-level so
    replay semantics are directly testable."""
    b = batch_df
    if quality_kwargs is not None:
        b = (gopher_quality_flags(b, **quality_kwargs).where("keep")
             .select("doc_id", "text"))
        b = (repetition_flags(b).where("keep")
             .withColumnRenamed("id", "doc_id")
             .join(batch_df, "doc_id").select("doc_id", "text"))
    b = dedup_exact(b)
    # the pair joins below reference b on both sides of several plans
    b = b.localCheckpoint(eager=True)
    corpus = read_corpus(spark, corpus_path, before_batch=batch_id)
    if corpus is not None:
        hits = prefix_filter_pairs(
            b, threshold=threshold, other=corpus).select(
            F.col("id_a").alias("doc_id")).distinct()
        b = b.join(hits, "doc_id", "left_anti").localCheckpoint(eager=True)
    pairs = prefix_filter_pairs(b, threshold=threshold)
    keep = near_dup_clusters(b, pairs).where("is_canonical") \
        .select(F.col("id").alias("doc_id"))
    out = b.join(keep, "doc_id").select("doc_id", "text")
    out.write.mode("overwrite").parquet(
        os.path.join(corpus_path, f"batch={batch_id}"))


def run_corpus_ingest(
    spark: SparkSession,
    input_dir: str,
    corpus_path: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    quality_kwargs: dict | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start the ingestion stream. available_now=True drains pending
    files and stops (test/backfill mode); max_files_per_trigger=1
    forces one micro-batch per arriving file."""
    stream = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        stream = stream.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = stream.parquet(input_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(spark, batch_df, batch_id, corpus_path,
                     threshold=threshold, quality_kwargs=quality_kwargs)

    writer = (
        docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
