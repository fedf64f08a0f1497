from combblas_spark.streaming.corpus import (
    ingest_batch,
    read_corpus,
    read_document_stream,
    run_corpus_ingest,
)
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
    "ingest_batch",
    "read_corpus",
    "read_document_stream",
    "read_edge_table",
    "read_event_stream",
    "run_corpus_ingest",
    "run_edge_merge",
    "run_vertex_stats",
    "stateful_vertex_stats",
    "stream_to_edge_deltas",
]
