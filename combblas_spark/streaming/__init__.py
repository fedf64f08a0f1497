from combblas_spark.streaming.edges import (
    edge_rate_per_window,
    read_event_stream,
    run_edge_merge,
    stream_to_edge_deltas,
)

__all__ = [
    "edge_rate_per_window",
    "read_event_stream",
    "run_edge_merge",
    "stream_to_edge_deltas",
]
