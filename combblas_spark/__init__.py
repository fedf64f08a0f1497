"""combblas_spark — a PySpark-native combinatorial-BLAS-style link-graph engine.

Re-expresses the query/data-processing capabilities of CombBLAS
(distributed sparse matrices over semirings; see /root/reference) as
idiomatic Spark DataFrame operators:

* a sparse matrix  -> an ``edges(src: long, dst: long, val: double)`` DataFrame
* a (sparse) vector-> a  ``verts(id: long, val: T)`` DataFrame
* a semiring       -> a (multiply Column expr, aggregate fn) pair
* SpMV / SpGEMM    -> join + groupBy.agg
* Apply/Prune/EWise-> withColumn / filter / join

Nothing here is a port: execution is Catalyst/Tungsten; the reference's
hand-rolled SUMMA broadcasts, buffer management and hybrid local kernels
are replaced by Spark shuffles, AQE and whole-stage codegen (SURVEY.md §4).
"""

from combblas_spark.session import get_spark
from combblas_spark.operators.semiring import (
    Semiring,
    PLUS_TIMES,
    MIN_PLUS,
    MAX_TIMES,
    SELECT2ND_MIN,
    SELECT2ND_MAX,
)
from combblas_spark.operators.spmv import spmv
from combblas_spark.operators.spgemm import spgemm

__all__ = [
    "get_spark",
    "Semiring",
    "PLUS_TIMES",
    "MIN_PLUS",
    "MAX_TIMES",
    "SELECT2ND_MIN",
    "SELECT2ND_MAX",
    "spmv",
    "spgemm",
]

__version__ = "0.1.0"
