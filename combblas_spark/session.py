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
        # zstd shuffle/spill compression: measured 29% fewer bytes per
        # PageRank superstep vs lz4 (594 -> 420 MB at RMAT-23) at equal
        # steady-state walls; on a cluster the shuffle is network-bound,
        # so fewer bytes is a straight win (BENCH.md byte-count table).
        .config("spark.io.compression.codec", "zstd")
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
