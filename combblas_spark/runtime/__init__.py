from combblas_spark.runtime.superstep import (
    SuperstepRunner,
    load_imbalance,
    partition_histogram,
)

__all__ = ["SuperstepRunner", "load_imbalance", "partition_histogram"]
