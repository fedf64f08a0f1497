"""Graph algorithms — the engine's "queries" (SURVEY.md §2.6)."""

from combblas_spark.algorithms.pagerank import pagerank
from combblas_spark.algorithms.components import connected_components
from combblas_spark.algorithms.labelprop import label_propagation
from combblas_spark.algorithms.triangles import triangle_count
from combblas_spark.algorithms.bfs import bfs_levels, bfs_parents
from combblas_spark.algorithms.sssp import sssp
from combblas_spark.algorithms.mcl import mcl
from combblas_spark.algorithms.mis import maximal_independent_set
from combblas_spark.algorithms.matching import bipartite_maximal_matching

__all__ = [
    "bipartite_maximal_matching",
    "mcl",
    "maximal_independent_set",
    "pagerank",
    "connected_components",
    "label_propagation",
    "triangle_count",
    "bfs_levels",
    "bfs_parents",
    "sssp",
]
