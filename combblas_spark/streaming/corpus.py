"""Streaming corpus ingestion: the training-data pipeline as a stream.

Arriving document batches are quality-filtered (Gopher + repetition
rules), exact-deduped within the batch, near-dup-checked INCREMENTALLY
against the standing corpus, near-dup-canonicalized within the batch
(connected components over the pair graph), and survivors appended to
the corpus as their own ``batch=<id>`` directory.

Incremental cost (ADVICE r3): the corpus side is never re-shingled or
re-aggregated. Each committed batch also persists three SIDECAR tables
next to its documents —

    _shingles/batch=<id>   (id, sh)   distinct word-3-grams per doc
    _sizes/batch=<id>      (id, n)    |S(id)| per doc
    _df/batch=<id>         (sh, df)   the batch's shingle-df contribution

— and the per-ingest near-dup check is ``incremental_prefix_pairs``:
a ONE-SIDED prefix join (batch-prefix x corpus-full-shingles; the
prefix-filter pigeonhole only needs the incoming side's prefix, see
functions/dedup.py), ranked by the summed persisted df contributions.
Rarity order is an optimization, not a correctness input, so stale df
never produces wrong pairs. Per-ingest work is O(batch shingles) plus
one scan of the pre-aggregated sidecars — no O(corpus) re-shingle. At
real scale the _df contributions would be periodically compacted into
one snapshot and _shingles bucketed by sh; both are storage-layout
refinements of the same read path.

Idempotent under foreachBatch's at-least-once replay: a batch writes
only its own directories (same id -> same paths -> same bytes), and
every standing-corpus read EXCLUDES directories with id >= the current
batch id — a replayed batch never sees its own previous output (which
would self-dedup everything to an empty rewrite).

Restart safety (ADVICE r3): stream batch ids restart at 0 with a fresh
checkpoint, so raw ids would OVERWRITE an existing corpus. Directory
ids are ``base + stream_batch_id`` where base = max existing batch dir
+ 1, computed once per checkpoint and persisted INSIDE the checkpoint
directory — restarting the same checkpoint reuses the same mapping
(replay stays idempotent); a fresh checkpoint appends after the
standing corpus instead of clobbering batch=0.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from combblas_spark.functions.dedup import (
    dedup_exact, incremental_prefix_pairs, near_dup_clusters,
    prefix_filter_pairs, shingles,
)
from combblas_spark.functions.text import gopher_quality_flags, repetition_flags

DOC_SCHEMA = "doc_id long, text string"
_BATCH_RE = re.compile(r"^batch=(\d+)$")
_SIDECARS = ("_shingles", "_sizes", "_df")
_BASE_META = "combblas_ingest_base.json"


def read_document_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return spark.readStream.schema(DOC_SCHEMA).parquet(input_dir)


def _batch_dirs(root: str, before_batch: int | None) -> list[str]:
    if not os.path.isdir(root):
        return []
    out = []
    for name in sorted(os.listdir(root)):
        m = _BATCH_RE.match(name)
        if m and (before_batch is None or int(m.group(1)) < before_batch):
            out.append(os.path.join(root, name))
    return out


def read_corpus(spark: SparkSession, corpus_path: str,
                before_batch: int | None = None) -> DataFrame | None:
    """Standing corpus = union of committed batch directories (ids <
    ``before_batch`` when given). Returns None when empty."""
    dirs = _batch_dirs(corpus_path, before_batch)
    if not dirs:
        return None
    return spark.read.schema(DOC_SCHEMA).parquet(*dirs)


def _read_sidecar(spark: SparkSession, corpus_path: str, kind: str,
                  schema: str, before_batch: int | None) -> DataFrame | None:
    dirs = _batch_dirs(os.path.join(corpus_path, kind), before_batch)
    if not dirs:
        return None
    return spark.read.schema(schema).parquet(*dirs)


def _write_sidecars(docs: DataFrame, corpus_path: str, batch_id: int,
                    shingles_df: DataFrame | None = None) -> None:
    """Persist the three sidecar tables for one (doc_id, text) batch.
    Deterministic paths + overwrite => replay/backfill idempotent.
    ``shingles_df``: precomputed (id, sh) for these docs (the ingest
    path shingles the batch ONCE and filters — review r4)."""
    sh = shingles_df if shingles_df is not None else docs.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("sh"),
    ).localCheckpoint(eager=True)
    sh.write.mode("overwrite").parquet(
        os.path.join(corpus_path, "_shingles", f"batch={batch_id}"))
    sh.groupBy("id").agg(F.count(F.lit(1)).alias("n")) \
        .write.mode("overwrite").parquet(
        os.path.join(corpus_path, "_sizes", f"batch={batch_id}"))
    sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df")) \
        .write.mode("overwrite").parquet(
        os.path.join(corpus_path, "_df", f"batch={batch_id}"))


def _backfill_legacy_sidecars(spark: SparkSession, corpus_path: str,
                              before_batch: int) -> None:
    """Corpora created before the sidecar format (or by hand) have
    batch=<id> document dirs with no matching sidecars. The incremental
    join reads ONLY sidecars, so any uncovered batch would silently
    never be dedup-checked again (review finding r4). Backfill them
    once — O(legacy docs), amortized over the corpus lifetime — so the
    sidecar union always covers every committed batch."""
    def ids(root: str) -> set[int]:
        return {int(_BATCH_RE.match(os.path.basename(d)).group(1))
                for d in _batch_dirs(root, before_batch)}

    committed = ids(corpus_path)
    covered = set.intersection(
        *(ids(os.path.join(corpus_path, k)) for k in _SIDECARS))
    for bid in sorted(committed - covered):
        docs = spark.read.schema(DOC_SCHEMA).parquet(
            os.path.join(corpus_path, f"batch={bid}"))
        _write_sidecars(docs, corpus_path, bid)


def max_batch_id(corpus_path: str) -> int:
    """Largest committed batch directory id, -1 when none exist."""
    dirs = _batch_dirs(corpus_path, None)
    return max((int(_BATCH_RE.match(os.path.basename(d)).group(1))
                for d in dirs), default=-1)


def ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    corpus_path: str,
    threshold: float = 0.8,
    quality_kwargs: dict | None = None,
) -> None:
    """One micro-batch through the full cleaning chain; module-level so
    replay semantics are directly testable. ``batch_id`` is the final
    DIRECTORY id (the stream handler applies the checkpoint base)."""
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
    # shingle the batch ONCE (review r4: the corpus check, the within-
    # batch pair join, and the sidecar write each re-exploded it); the
    # table only SHRINKS downstream, so later stages semi-join-filter it
    sh_b = b.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("sh"),
    ).localCheckpoint(eager=True)

    # one-time migration: batches written without sidecars (legacy
    # corpora) get theirs computed now, so the sidecar union below is
    # ALWAYS the full standing corpus — there is no fallback path whose
    # coverage could silently diverge (review finding r4: the old
    # fallback went dead after the first sidecar-format commit,
    # skipping dedup against every pre-sidecar batch).
    _backfill_legacy_sidecars(spark, corpus_path, before_batch=batch_id)
    corpus_sh = _read_sidecar(spark, corpus_path, "_shingles",
                              "id long, sh string", before_batch=batch_id)
    if corpus_sh is not None:
        # sidecar path: corpus side fully precomputed (O(batch) work)
        corpus_sz = _read_sidecar(spark, corpus_path, "_sizes",
                                  "id long, n long", before_batch=batch_id)
        dfc = _read_sidecar(spark, corpus_path, "_df",
                            "sh string, df long", before_batch=batch_id)
        dft = dfc.groupBy("sh").agg(F.sum("df").alias("df"))
        hits = incremental_prefix_pairs(
            b, corpus_sh, corpus_sz, df_table=dft, threshold=threshold,
            shingles_df=sh_b,
        ).select(F.col("id_a").alias("doc_id")).distinct()
        b = b.join(hits, "doc_id", "left_anti").localCheckpoint(eager=True)
        sh_b = sh_b.join(b.select(F.col("doc_id").alias("id")), "id",
                         "left_semi").localCheckpoint(eager=True)

    pairs = prefix_filter_pairs(b, threshold=threshold, shingles_df=sh_b)
    keep = near_dup_clusters(b, pairs).where("is_canonical") \
        .select(F.col("id").alias("doc_id"))
    out = b.join(keep, "doc_id").select("doc_id", "text") \
        .localCheckpoint(eager=True)
    out.write.mode("overwrite").parquet(
        os.path.join(corpus_path, f"batch={batch_id}"))
    # sidecars for the survivors (same id -> same path: replay-idempotent)
    _write_sidecars(out, corpus_path, batch_id,
                    shingles_df=sh_b.join(
                        out.select(F.col("doc_id").alias("id")), "id",
                        "left_semi"))


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
    # checkpoint-scoped directory-id base (see module doc): fresh
    # checkpoint over an existing corpus appends, never overwrites
    meta_path = os.path.join(checkpoint_dir, _BASE_META)
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            base = int(json.load(fh)["base"])
    else:
        base = max_batch_id(corpus_path) + 1
        os.makedirs(checkpoint_dir, exist_ok=True)
        with open(meta_path, "w") as fh:
            json.dump({"base": base}, fh)

    stream = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        stream = stream.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = stream.parquet(input_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(spark, batch_df, base + batch_id, corpus_path,
                     threshold=threshold, quality_kwargs=quality_kwargs)

    writer = (
        docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
