from combblas_spark.streaming.edges import (
    compact_edge_table,
    edge_rate_per_window,
    read_edge_table,
    read_event_stream,
    run_edge_merge,
    stream_to_edge_deltas,
)
from combblas_spark.streaming.stateful import (
    run_vertex_stats,
    stateful_vertex_stats,
)

__all__ = [
    "compact_edge_table",
    "edge_rate_per_window",
    "read_edge_table",
    "read_event_stream",
    "run_edge_merge",
    "run_vertex_stats",
    "stateful_vertex_stats",
    "stream_to_edge_deltas",
]
