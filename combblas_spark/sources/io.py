"""Storage abstraction: Iceberg catalog tables when available, Parquet
paths otherwise (SURVEY.md §7 hard part (d)).

The reference's parallel readers/writers (ParallelReadMM
SpParMat.cpp:3993, ParallelWriteMM :4133, ParallelBinaryWrite :620) map
onto Spark's parallel columnar scan/write; dedup-on-read with a user
binop (ParallelReadMM's fourth argument) is exposed as an optional
groupBy aggregate.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _is_path(name: str) -> bool:
    return "/" in name or name.endswith(".parquet")


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Read an Iceberg/catalog table by name, or a Parquet path."""
    if _is_path(name):
        return spark.read.parquet(name)
    return spark.read.table(name)


def write_table(df: DataFrame, name: str, mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    """Write to an Iceberg/catalog table or a Parquet path."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if _is_path(name):
        w.parquet(name)
    else:
        w.saveAsTable(name)


def write_bucketed_edges(
    df: DataFrame,
    table: str,
    buckets: int = 32,
    key: str = "src",
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist an edge table hash-bucketed and row-sorted — the durable
    form of the north star's "hash-partitioned CSR-block tables", and
    the storage analogue of the reference's static 2D block distribution
    (SpParMat carries its block layout across operations instead of
    re-distributing per call; include/CombBLAS/SpParMat.h:62-115).

    ``bucketBy(buckets, key)`` records HashPartitioning(key, buckets) in
    the catalog, so every later join or aggregation on ``key`` reads the
    edge side WITHOUT an exchange — at 100 TB that deletes the one
    edge-sized shuffle a cold-loaded superstep would otherwise pay; only
    the vector side moves. ``sortBy(key, other)`` makes each bucket file
    a CSR-like run (a vertex's edges contiguous, neighbors ordered), so
    — with one file per bucket (guaranteed below) and
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` (set in
    session.py) — sort-merge joins skip the edge-side sort too, and
    parquet gets long RLE runs on the key column. Measured plan for
    SpMV-shaped ``edges JOIN vector ON src``: zero Exchange, zero Sort
    above the edge FileScan (tests/test_ingestion.py).

    ``path`` makes it an external table (data at ``path``, bucketing
    metadata in the catalog). Bucket metadata lives in the catalog, not
    the files — read back with ``read_bucketed_edges`` / ``spark.table``,
    NOT ``spark.read.parquet`` (a path read would silently drop the
    partitioning guarantee).
    """
    other = "dst" if key == "src" else "src"
    cols = [c for c in (key, other) if c in df.columns] + [
        c for c in df.columns if c not in ("src", "dst")
    ]
    # repartition on the bucket key into exactly `buckets` partitions:
    # repartition and bucketBy share the Murmur3 hash, so every task
    # holds exactly one bucket and each bucket lands in ONE file — the
    # precondition for the scan to expose outputOrdering and let
    # sort-merge joins skip the edge-side sort entirely.
    w = (
        df.select(*cols).repartition(buckets, key)
        .write.mode(mode).format("parquet")
        .bucketBy(buckets, key).sortBy(key, other)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed_edges(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read of a ``write_bucketed_edges`` table — the scan
    carries HashPartitioning(key, buckets), which Catalyst uses to drop
    the edge-side exchange from joins/aggs on the bucket key."""
    return spark.table(table)


def read_triples(
    spark: SparkSession,
    name: str,
    dedup: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """ParallelReadMM analogue: read (src,dst,val) triples, optionally
    combining duplicate coordinates with ``dedup`` (e.g. F.max — the
    reference passes maximum<double>() in CC.cpp:142)."""
    df = read_table(spark, name)
    if dedup is not None:
        df = df.groupBy("src", "dst").agg(dedup(F.col("val")).alias("val"))
    return df
