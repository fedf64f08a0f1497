from combblas_spark.streaming.edges import (
    compact_edge_table,
    edge_rate_per_window,
    read_edge_table,
    read_event_stream,
    run_edge_merge,
    stream_to_edge_deltas,
)

__all__ = [
    "compact_edge_table",
    "edge_rate_per_window",
    "read_edge_table",
    "read_event_stream",
    "run_edge_merge",
    "stream_to_edge_deltas",
]
