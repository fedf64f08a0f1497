"""SparkSession factory tuned for the link-graph workload.

Local-mode analogue of the reference's MPI bootstrap (CommGrid ctor,
include/CombBLAS/CommGrid.h:45-134): instead of a sqrt(p) x sqrt(p)
process grid we size shuffle parallelism to the core count and let AQE
re-plan at runtime (skew joins, partition coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "combblas_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a local SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or 32.
    ``shuffle_partitions`` defaults to 2x cores — enough slots for skewed
    reduce stages without drowning tiny inputs in task overhead (AQE
    coalesces down at runtime anyway).
    """
    cores = str(cores or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n = int(cores)
    shuffle = shuffle_partitions or max(2 * n, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Compression codec is SCALE-dependent (measured, BENCH.md):
        # zstd moves 29% fewer bytes/superstep at RMAT-23 (byte-bound —
        # the 100TB cluster regime, where shuffle crosses the network)
        # at equal walls, but costs ~20% wall on the small/latency-bound
        # sf0.1 suite. Default lz4 locally; flip via SPARK_GRAFT_CODEC
        # or extra_conf — scripts/scaling.py pins zstd for the at-scale
        # protocol.
        .config("spark.io.compression.codec",
                os.environ.get("SPARK_GRAFT_CODEC", "lz4"))
        # Expose bucketed-scan sort order to the planner (off by default
        # since SPARK-28595 because multi-file buckets made it
        # pessimistic). Spark still checks one-file-per-bucket before
        # using it, and write_bucketed_edges (sources/io.py) guarantees
        # exactly that — so joins on a bucketed edge table need neither
        # an exchange NOR a sort on the edge side.
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # NOTE: keep the heap right-sized (<=20g). Measured: a 40g heap
        # produces multi-second G1 young-gen pauses (and 10s+ ParallelGC
        # full GCs) under wide shuffle allocation; at <=16g both
        # collectors run smooth sub-300ms pauses.
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
