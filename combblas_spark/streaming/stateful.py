"""Custom stateful streaming operator — incremental per-vertex stats.

The batch engine computes vertex degrees/weights with ``Reduce(dim,
plus)`` (operators/reduce.py; SpParMat::Reduce, SpParMat.cpp:1142).
This module maintains the same reduction INCREMENTALLY over an event
stream with ``applyInPandasWithState``: per source vertex, the running
out-degree (edge-event count) and edge-weight sum survive across
micro-batches in the state store — and across QUERY RESTARTS via the
checkpoint (asserted in tests/test_streaming.py), which is the
streaming half of the north rule's "resumable from checkpoint"
requirement.

Scale shape: state is keyed by src (hash-distributed by the state
store), each micro-batch touches only the keys present in the batch,
and the per-key update is O(batch rows for that key) in a vectorized
pandas body. Output mode "update": one row per touched key per batch
with the new running totals.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from combblas_spark.graph import hashed_dst
from combblas_spark.portable import pround_py

STATS_SCHEMA = "src long, out_degree long, weight_sum double"
STATE_SCHEMA = "cnt long, ws double"


def _update_vertex_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    cnt, ws = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        cnt += len(pdf)
        ws += float(pdf["value"].sum())
    state.update((cnt, ws))
    yield pd.DataFrame(
        {"src": [key[0]], "out_degree": [cnt], "weight_sum": [ws]})


def stateful_vertex_stats(events: DataFrame, n_vertices: int) -> DataFrame:
    """events (event_id, ts, user_id, value, ...) -> streaming frame of
    (src, out_degree, weight_sum) running totals, one update row per
    touched vertex per micro-batch.

    Uses the same edge-derivation rule as graph.events_graph so the
    running totals converge to the batch engine's
    ``reduce_dim(graph, "row", count/sum)`` over the same events
    (loops excluded identically).
    """
    edges = events.select(
        F.col("user_id").alias("src"),
        hashed_dst("event_id", n_vertices).alias("dst"),
        F.col("value"),
    ).filter(F.col("src") != F.col("dst"))
    return edges.groupBy("src").applyInPandasWithState(
        _update_vertex_stats,
        outputStructType=STATS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_vertex_stats(
    spark, input_dir: str, out_table: str, checkpoint: str, n_vertices: int
):
    """availableNow drain: read event parquet drops from ``input_dir``,
    maintain stateful vertex stats, append update rows to ``out_table``
    (parquet; latest row per src per batch = current running total).
    Returns the started query."""
    from combblas_spark.streaming.edges import read_event_stream

    events = read_event_stream(spark, input_dir)
    stats = stateful_vertex_stats(events, n_vertices)
    # foreachBatch: the file sink only accepts append-mode queries and
    # holds stateful-append emissions back a trigger; update-mode rows
    # land immediately this way (same pattern as run_edge_merge)
    return (
        stats.writeStream
        .foreachBatch(
            lambda df, _bid: df.write.mode("append").parquet(out_table))
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


HLL_OUT_SCHEMA = "key string, distinct_est double"
HLL_STATE_SCHEMA = "regs array<integer>"


def stateful_hll_distinct(rows: DataFrame, key_col: str, val_col: str,
                          p: int = 6) -> DataFrame:
    """Streaming twin of functions/sketch.hll_distinct: per-key HLL
    registers live in the state store and merge each micro-batch by
    register-wise MAX — the CRDT property means the streaming estimate
    after any drain equals the batch estimate over the union of all
    batches (asserted in tests/test_streaming.py), and state survives
    query restarts via the checkpoint.

    The register derivation is the exact same md5 formula as the batch
    op (hashlib.md5 == the JVM md5), computed in the pandas state body
    — stateful custom logic is the documented applyInPandasWithState
    territory; the batch-scan path stays JVM-side in sketch.py.

    Output mode "update": one (key, distinct_est) row per touched key
    per micro-batch; state is 2^p ints per key.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    w = 32 - p
    mask = (1 << w) - 1
    alpha_mm = (0.7213 / (1.0 + 1.079 / m)) * m * m

    def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        import hashlib

        regs = list(state.get[0]) if state.exists else [0] * m
        for pdf in pdfs:
            for v in pdf["_v"].astype(str):
                h = int(hashlib.md5(v.encode()).hexdigest()[:8], 16)
                i = h >> w
                rest = h & mask
                r = (w + 1) if rest == 0 else w - rest.bit_length() + 1
                if r > regs[i]:
                    regs[i] = r
        state.update((regs,))
        s = 0.0
        for r in regs:
            s = s + 1.0 / (1 << r)
        yield pd.DataFrame({"key": [key[0]],
                            "distinct_est": [pround_py(alpha_mm / s)]})

    keyed = rows.select(F.col(key_col).cast("string").alias("key"),
                        F.col(val_col).cast("string").alias("_v"))
    return keyed.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=HLL_OUT_SCHEMA,
        stateStructType=HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
