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
